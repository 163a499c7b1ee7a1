"""Full-size-shape parallel layout validation on the 8-device CPU mesh.

The tp/pp/fsdp parity tests elsewhere run at tiny shapes; these build the
REAL WavLM-Large geometry — 24 layers, 1024 hidden, 4096 FFN, 16 heads
(`/root/reference/src/models/DualStreamSEMamba.py:276-439` operating point)
— over a (data=2, pipe=2, model=2) mesh and verify:

- to_pp_layout/from_pp_layout round-trip at 24 x 1024/4096 shapes;
- the tensor-parallel rules (parallel/tp.py) shard EVERY intended encoder
  leaf at the real dims (divisibility: 24 % 2 stages, 16 heads % 2 model,
  1024/4096 % 2) — including the Adam mu/nu mirrors;
- fsdp additionally ZeRO-shards the large leaves over `data`;
- ONE forward of the pipelined functional frontend executes sharded on the
  full geometry (VERDICT r2 item 4).

Slow by construction (~315M params on one CPU core): `pytest -m slow`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from rade_tpu.nn.wavlm import WavLMConfig, WavLMFrontend
from rade_tpu.nn.wavlm_pp import from_pp_layout, to_pp_layout, wavlm_features_pp
from rade_tpu.parallel import pp
from rade_tpu.parallel.mesh import DATA_AXIS
from rade_tpu.parallel.pp import PIPE_AXIS, make_mesh_pp
from rade_tpu.parallel.tp import MODEL_AXIS, shard_tree

pytestmark = pytest.mark.slow

CFG = WavLMConfig.large(lora_rank=8)
N_LAYERS = CFG.num_hidden_layers  # 24


@pytest.fixture(scope="module")
def large_params():
    model = WavLMFrontend(CFG)
    x = jnp.zeros((1, 4000), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False,
    )
    return variables["params"]


@pytest.fixture(autouse=True)
def _pp_clean():
    yield
    pp.deactivate()


def _axes_of(spec):
    out = set()
    for s in spec or ():
        if s is None:
            continue
        out.update((s,) if isinstance(s, str) else tuple(s))
    return out


def test_geometry_is_real():
    assert CFG.hidden_size == 1024
    assert CFG.num_hidden_layers == 24
    assert CFG.num_attention_heads == 16
    assert CFG.intermediate_size == 4096


def test_pp_roundtrip_fullsize(large_params):
    ppp = to_pp_layout(large_params["model"], N_LAYERS)
    lead = jax.tree.leaves(ppp["layers_pipe"])[0].shape[0]
    assert lead == N_LAYERS and N_LAYERS % 2 == 0  # divisible by pipe=2
    back = from_pp_layout(ppp, N_LAYERS)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        large_params["model"], back,
    )


def test_tp_pp_sharding_covers_every_intended_leaf(large_params):
    mesh = make_mesh_pp(2, 2, 2, devices=jax.devices("cpu")[:8])
    ppp = {
        "layer_weights": large_params["layer_weights"],
        "model": to_pp_layout(large_params["model"], N_LAYERS),
    }
    sharded = shard_tree(ppp, mesh)

    # every stacked encoder leaf must carry pipe on the layer axis
    flat = jax.tree_util.tree_flatten_with_path(
        sharded["model"]["layers_pipe"]
    )[0]
    want_model = {
        "q_proj/kernel": 1024, "k_proj/kernel": 1024, "v_proj/kernel": 1024,
        "q_proj/bias": 1024, "k_proj/bias": 1024, "v_proj/bias": 1024,
        "out_proj/kernel": 1024,  # row-parallel: input dim
        "intermediate_dense/kernel": 4096, "intermediate_dense/bias": 4096,
        "output_dense/kernel": 4096,  # row-parallel: input dim
        "lora_B_q_proj": 1024, "lora_B_v_proj": 1024,
    }
    seen = dict.fromkeys(want_model, 0)
    for path, leaf in flat:
        pstr = "/".join(
            str(getattr(k, "key", getattr(k, "name", k))) for k in path
        )
        spec = leaf.sharding.spec
        axes = _axes_of(spec)
        assert PIPE_AXIS in axes, f"{pstr}: layer axis not pipe-sharded"
        assert spec[0] == PIPE_AXIS
        for suffix, dim in want_model.items():
            if pstr.endswith(suffix) or (suffix in pstr and "lora" in suffix):
                assert MODEL_AXIS in axes, f"{pstr}: not model-sharded"
                ax = spec.index(MODEL_AXIS)
                # .shape is GLOBAL: the model axis must sit on the intended
                # dim, and its per-device shard must be dim/2
                assert leaf.shape[ax] == dim, (
                    f"{pstr}: model axis on global dim {leaf.shape[ax]}, "
                    f"want {dim}"
                )
                local = leaf.addressable_shards[0].data.shape[ax]
                assert local == dim // 2, (
                    f"{pstr}: local shard dim {local}, want {dim // 2}"
                )
                seen[suffix] += 1
    for suffix, count in seen.items():
        assert count >= 1, f"no leaf matched TP rule {suffix}"

    # Adam mirrors: mu/nu carry the param path as a suffix, so the same
    # rules shard them identically (what the real TrainState relies on)
    opt = optax.adamw(1e-4)
    opt_state = opt.init(ppp)
    sh_opt = shard_tree(opt_state, mesh)
    n_mirror = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(sh_opt)[0]:
        pstr = "/".join(str(getattr(k, "key", getattr(k, "name", k))) for k in path)
        if "layers_pipe" in pstr and "q_proj/kernel" in pstr:
            assert leaf.sharding.spec[0] == PIPE_AXIS, pstr
            assert MODEL_AXIS in _axes_of(leaf.sharding.spec), pstr
            n_mirror += 1
    assert n_mirror >= 2  # mu and nu


def test_fsdp_shards_large_leaves_at_real_dims(large_params):
    mesh = make_mesh_pp(2, 2, 2, devices=jax.devices("cpu")[:8])
    ppp = {
        "layer_weights": large_params["layer_weights"],
        "model": to_pp_layout(large_params["model"], N_LAYERS),
    }
    sharded = shard_tree(ppp, mesh, fsdp=True, fsdp_min_size=16384)
    n_fsdp = n_big = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(sharded)[0]:
        if leaf.size < 16384:
            continue
        n_big += 1
        spec = list(leaf.sharding.spec) + [None] * (
            leaf.ndim - len(leaf.sharding.spec)
        )
        if DATA_AXIS in _axes_of(spec):
            n_fsdp += 1
        else:
            # acceptable only when every axis is ALREADY sharded (e.g. the
            # stacked (24, 1024) bias vectors carry pipe x model — nothing
            # left for ZeRO to split)
            pstr = "/".join(
                str(getattr(k, "key", getattr(k, "name", k))) for k in path
            )
            assert all(s is not None for s in spec), (
                f"{pstr} {leaf.shape}: big leaf not ZeRO-sharded and has "
                f"free axes ({spec})"
            )
    # the pp layout STACKS the 24 encoder layers, so "big" leaves are few
    # but huge (e.g. one (24, 1024, 1024) qkv kernel per projection)
    assert n_big >= 20, f"only {n_big} big leaves — geometry changed?"
    assert n_fsdp >= n_big - 4, f"only {n_fsdp}/{n_big} big leaves ZeRO-sharded"


def test_fullsize_forward_2x2x2(large_params):
    """One sharded forward of the pipelined WavLM-Large frontend."""
    mesh = make_mesh_pp(2, 2, 2, devices=jax.devices("cpu")[:8])
    pp.activate(mesh)
    ppp = {
        "layer_weights": large_params["layer_weights"],
        "model": to_pp_layout(large_params["model"], N_LAYERS),
    }
    ppp = shard_tree(ppp, mesh)
    x = jax.device_put(
        jnp.asarray(
            np.random.RandomState(0).randn(4, 4000) * 0.1, jnp.float32
        ),
        NamedSharding(mesh, P(DATA_AXIS)),
    )

    @jax.jit
    def fwd(params, x):
        return wavlm_features_pp(params, x, CFG, mesh=mesh, n_micro=2)

    out = np.asarray(fwd(ppp, x))
    assert out.shape[0] == 4 and out.shape[-1] == CFG.hidden_size
    assert np.isfinite(out).all()
