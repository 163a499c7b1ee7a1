"""ICI collective-volume model for the DP scaling projection.

Measures (not estimates) the inputs of the all-reduce cost model for the
shipped Phase-6 recipe:

- gradient bytes all-reduced per optimizer step = sum of TRAINABLE
  parameter leaf sizes (the trainable-only differentiation means frozen
  WavLM base weights under LoRA contribute no gradient traffic);
- the measured single-chip step time (benchmarks/bench_train.py).

and evaluates  t_allreduce = 2 * V * (N-1) / N / BW  (bidirectional ring)
against the step time for a v5e-8 DP pod.  BW is per-chip ICI bandwidth;
v5e has 4 ICI links x ~45 GB/s usable per direction (2D torus), so a ring
all-reduce sustains ~45-90 GB/s per chip — both endpoints are reported.

Run: RADE_PLATFORM=cpu python benchmarks/collective_volume.py [step_ms]
"""

from __future__ import annotations

import sys

import jax
import numpy as np

sys.path.insert(0, ".")


def main(step_ms: float = 647.0):
    import __graft_entry__ as ge
    from rade_tpu.train.loop import Experiment

    cfg = ge._phase6_cfg(tiny=False)
    # shapes only — no TPU needed; build on CPU with the Pallas paths off
    # (identical parameter tree, the kernels only change the compute path)
    for k in ("use_pallas_scan", "use_pallas_resblock",
              "use_pallas_resblock_training"):
        cfg.model_config[k] = False
    exp = Experiment(cfg, seed=0, fast_init=True)
    params = exp.params
    mask = exp.trainable_mask

    def leaf_bytes(p, m):
        p = np.asarray(jax.eval_shape(lambda: p) if callable(p) else p)
        trainable = np.broadcast_to(np.asarray(m, np.float32), p.shape) > 0
        return trainable.sum() * 4  # f32 gradients

    total_params = sum(np.asarray(p).size for p in jax.tree.leaves(params))
    if mask is None:
        grad_bytes = total_params * 4
    else:
        grad_bytes = int(
            sum(
                leaf_bytes(p, m)
                for p, m in zip(jax.tree.leaves(params), jax.tree.leaves(mask))
            )
        )
    v_gb = grad_bytes / 1e9
    print(f"total params:        {total_params/1e6:.1f} M")
    print(f"trainable grad vol:  {grad_bytes/1e6:.2f} MB/step (f32)")
    n = 8
    for bw in (45e9, 90e9):
        t_ar = 2 * grad_bytes * (n - 1) / n / bw * 1e3
        frac = t_ar / step_ms
        print(
            f"v5e-8 ring all-reduce @ {bw/1e9:.0f} GB/s/chip: "
            f"{t_ar:.2f} ms = {100*frac:.2f}% of the {step_ms:.0f} ms step"
        )
    print(
        "projection: DP efficiency >= "
        f"{1/(1+2*grad_bytes*7/8/45e9/(step_ms/1e3)):.4f} "
        "(compute/comms fully serialized, worst case)"
    )


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 647.0)
