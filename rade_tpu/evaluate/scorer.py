"""Scoring loop: run the jit'd model over dev/eval sets and write score files.

Equivalent of the reference's `produce_evaluation_file`
(`/root/reference/src/main.py:958-995`): no-grad scoring in trial-file order,
score = logits[:,1] (or OC-Softmax cosine — handled inside the eval step),
per-utterance order asserted against the trial file, rows
``utt_id src key score``.  Also the 2021 variant (``utt_id score`` rows) the
reference ships without.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, List, Sequence, Tuple

import numpy as np

from rade_tpu.data.pipeline import EvalBatcher, prefetch


def collect_scores(
    eval_step: Callable,
    params,
    batch_stats,
    batcher: EvalBatcher,
    put_batch: Callable = None,
) -> Tuple[List[float], List[str]]:
    """Run the scorer over all batches, dropping pad rows; preserves order.

    Returns ``(scores, utt_keys)`` so callers can assert every score row
    against the trial file's utt_id, like `/root/reference/src/main.py:989-993`.
    """
    scores: List[float] = []
    utt_keys: List[str] = []
    for x, keys, n_valid in prefetch(iter(batcher)):
        if put_batch is not None:
            x = put_batch(x)
        s = np.asarray(eval_step(params, batch_stats, x))
        scores.extend(s[:n_valid].tolist())
        utt_keys.extend(keys[:n_valid])
    return scores, utt_keys


def produce_evaluation_file(
    eval_step: Callable,
    params,
    batch_stats,
    batcher: EvalBatcher,
    trial_path,
    out_path,
    put_batch: Callable = None,
) -> None:
    """2019-style score file: ``utt_id src key score`` per trial line."""
    scores, utt_keys = collect_scores(
        eval_step, params, batch_stats, batcher, put_batch
    )
    with open(trial_path) as f:
        trial_lines = [ln for ln in f if ln.strip()]
    if len(trial_lines) != len(scores):
        raise ValueError(
            f"score/trial count mismatch: {len(scores)} vs {len(trial_lines)}"
        )
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with open(out_path, "w") as fh:
        for score, utt_key, line in zip(scores, utt_keys, trial_lines):
            _, utt_id, _, src, key = line.strip().split(" ")
            # per-utterance order assertion (reference src/main.py:989-993)
            if utt_id != utt_key:
                raise ValueError(
                    f"score order mismatch: scored {utt_key!r} against trial "
                    f"row {utt_id!r}"
                )
            fh.write(f"{utt_id} {src} {key} {score}\n")


def produce_evaluation_file_2021(
    eval_step: Callable,
    params,
    batch_stats,
    batcher: EvalBatcher,
    file_list: Sequence[str],
    out_path,
    put_batch: Callable = None,
) -> None:
    """2021-style score file: ``utt_id score`` rows (the missing
    `evaluation_2021` module of the reference — SURVEY.md §2.1 latent defect)."""
    scores, utt_keys = collect_scores(
        eval_step, params, batch_stats, batcher, put_batch
    )
    if len(file_list) != len(scores):
        raise ValueError(
            f"score/file count mismatch: {len(scores)} vs {len(file_list)}"
        )
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with open(out_path, "w") as fh:
        for utt, utt_key, score in zip(file_list, utt_keys, scores):
            if utt != utt_key:
                raise ValueError(
                    f"score order mismatch: scored {utt_key!r} against file "
                    f"row {utt!r}"
                )
            fh.write(f"{utt} {score}\n")
