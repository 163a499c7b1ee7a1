"""SAM, legacy schedulers, FGM mask, analysis tools, dirty-data filter."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from rade_tpu.config import OptimConfig
from rade_tpu.train.optim import legacy_schedule
from rade_tpu.train.sam import global_grad_norm, sam_gradient, sam_perturb


def test_sam_perturb_norm():
    params = {"a": jnp.ones(4), "b": jnp.ones(3) * 2}
    grads = {"a": jnp.ones(4), "b": jnp.zeros(3)}
    pert = sam_perturb(params, grads, rho=0.1)
    # ||g|| = 2, so a moves by 0.1 * 1/2 = 0.05
    np.testing.assert_allclose(np.asarray(pert["a"]), 1.05, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pert["b"]), 2.0, rtol=1e-6)


def test_sam_gradient_differs_from_plain():
    def loss(p):
        return jnp.sum(jnp.sin(p["w"]) ** 2)

    params = {"w": jnp.asarray([0.3, -0.7, 1.2])}
    plain = jax.grad(loss)(params)
    l, sam_g = sam_gradient(loss, params, 0.5, False)
    assert float(l) == pytest.approx(float(loss(params)))
    assert not np.allclose(np.asarray(plain["w"]), np.asarray(sam_g["w"]))


def test_legacy_multistep_matches_torch():
    oc = OptimConfig(base_lr=0.1, scheduler="multistep",
                     scheduler_config={"milestones": [3, 6], "lr_decay": 0.1})
    sched = legacy_schedule(oc)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=0.1)
    ts = torch.optim.lr_scheduler.MultiStepLR(opt, milestones=[3, 6], gamma=0.1)
    for step in range(10):
        assert float(sched(step)) == pytest.approx(opt.param_groups[0]["lr"], rel=1e-6)
        opt.step(); ts.step()


def test_legacy_sgdr_warm_restarts():
    oc = OptimConfig(base_lr=0.1, lr_min=0.001, scheduler="sgdr",
                     scheduler_config={"T0": 4, "Tmult": 2}, steps_per_epoch=4)
    sched = legacy_schedule(oc)
    lrs = [float(sched(s)) for s in range(13)]
    assert lrs[0] == pytest.approx(0.1)          # start of first period
    assert lrs[3] < lrs[0]                        # decaying within period
    assert lrs[4] == pytest.approx(0.1)           # restart at T0
    assert lrs[12] == pytest.approx(0.1)          # restart at T0 + T0*2
    assert min(lrs) >= 0.001 - 1e-9


def test_legacy_keras_decay():
    oc = OptimConfig(base_lr=0.1, scheduler="keras_decay",
                     scheduler_config={"decay": 0.01})
    sched = legacy_schedule(oc)
    assert float(sched(0)) == pytest.approx(0.1)
    assert float(sched(100)) == pytest.approx(0.1 / 2.0)


def test_legacy_cosine_lambda_form():
    oc = OptimConfig(base_lr=0.1, lr_min=0.001, scheduler="cosine",
                     epochs=2, steps_per_epoch=50)
    sched = legacy_schedule(oc)
    assert float(sched(0)) == pytest.approx(0.1)
    assert float(sched(100)) == pytest.approx(0.001, rel=1e-4)


def test_breakdown_tools(tmp_path):
    from rade_tpu.tools.analyze_breakdown import breakdown, write_markdown_report
    from rade_tpu.tools.compare_models import compare

    rng = np.random.RandomState(0)
    lines = [f"u{i} - bonafide {rng.normal(2, 1):.4f}" for i in range(100)]
    for i in range(200):
        src = f"A{7 + i % 13:02d}"
        lines.append(f"v{i} {src} spoof {rng.normal(-1, 1):.4f}")
    sf = tmp_path / "scores.txt"
    sf.write_text("\n".join(lines) + "\n")

    overall, per_attack = breakdown(str(sf))
    assert 0 <= overall <= 100 and len(per_attack) == 13
    out = tmp_path / "rep.md"
    write_markdown_report(str(sf), str(out))
    assert "A19" in out.read_text()

    report = compare(str(sf), str(sf))
    assert "+0.000" in report or "-0.000" in report  # identical files -> zero delta


def test_filter_dirty_protocol(tmp_path):
    from rade_tpu.pipelines.filter_dirty import write_filtered_protocol

    proto = tmp_path / "train.trn.txt"
    lines = [f"LA_{i:04d} KEY_{i:04d} - A07 spoof" for i in range(100)]
    proto.write_text("\n".join(lines) + "\n")
    sorted_keys = [f"KEY_{i:04d}" for i in range(100)]  # "dirtiest" first
    dirty, clean = write_filtered_protocol(proto, sorted_keys, 0.1, tmp_path)
    assert len(dirty.read_text().splitlines()) == 10
    kept = clean.read_text().splitlines()
    assert len(kept) == 90
    assert all("KEY_000" not in ln or int(ln.split()[1][4:]) >= 10 for ln in kept)


# ---------------------------------------------------------------------- SWA
def _tiny_state(use_swa):
    import optax
    from rade_tpu.train.state import TrainState

    params = {"w": jnp.asarray([1.0, 2.0]), "b": jnp.asarray([0.5])}
    tx = optax.sgd(0.1)
    return TrainState.create(
        params=params, batch_stats={}, tx=tx,
        rng=jax.random.PRNGKey(0), use_ema=True, use_swa=use_swa,
    )


def test_swa_snapshot_structure_stable():
    """snapshot must NOT change the state pytree structure: a None->tree flip
    would force the donated jit'd train step to recompile after the first
    new-best epoch (observed as a ~550 s epoch-1 stall on the flagship)."""
    state = _tiny_state(use_swa=True)
    before = jax.tree_util.tree_structure(state)
    snapped = state.swa_snapshot()
    assert jax.tree_util.tree_structure(snapped) == before
    # and pre-allocation means swa_params exists (zeros) from step 0
    assert state.swa_params is not None
    np.testing.assert_allclose(np.asarray(state.swa_params["w"]), 0.0)


def test_swa_snapshot_running_mean():
    state = _tiny_state(use_swa=True)
    # first snapshot == params exactly (zeros tree, n=0)
    s1 = state.swa_snapshot()
    np.testing.assert_allclose(np.asarray(s1.swa_params["w"]), [1.0, 2.0])
    assert int(s1.n_swa) == 1
    # move params, snapshot again -> arithmetic mean of the two snapshots
    s2 = s1.replace(params={"w": jnp.asarray([3.0, 4.0]), "b": jnp.asarray([1.5])})
    s3 = s2.swa_snapshot()
    np.testing.assert_allclose(np.asarray(s3.swa_params["w"]), [2.0, 3.0])
    np.testing.assert_allclose(np.asarray(s3.swa_params["b"]), [1.0])
    assert int(s3.n_swa) == 2


def test_swa_snapshot_lazy_fallback():
    # direct use without pre-allocation still works (use_swa off)
    state = _tiny_state(use_swa=False)
    assert state.swa_params is None
    s1 = state.swa_snapshot()
    np.testing.assert_allclose(np.asarray(s1.swa_params["w"]), [1.0, 2.0])
