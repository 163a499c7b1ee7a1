"""ASVspoof scoring metrics: DET curve, EER, tandem detection cost function (t-DCF).

TPU-native re-implementation of the reference metric stack
(`/root/reference/src/evaluation.py:126-335` and
`/root/reference/tDCF_python_v2/eval_metrics.py`).  The DET-curve sweep is the
exact mergesort-stable algorithm of the reference so EER/min-tDCF numbers agree
bit-for-bit; a vectorized `jax.numpy` EER is provided for on-device scoring of
large trial lists (the sort dominates; XLA sorts run on TPU).

Score convention everywhere: HIGHER score => stronger bona-fide support.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

__all__ = [
    "CostModel",
    "ASVSPOOF19_LA_COST_MODEL",
    "ASVSPOOF19_LA_COST_MODEL_REVISED",
    "compute_det_curve",
    "compute_eer",
    "compute_eer_minflip",
    "obtain_asv_error_rates",
    "compute_tdcf_legacy",
    "compute_tdcf_revised",
    "compute_eer_jax",
]


@dataclasses.dataclass(frozen=True)
class CostModel:
    """t-DCF cost parameters (ASVspoof 2019 evaluation plan)."""

    p_spoof: float = 0.05
    p_target: float = 0.9405  # (1 - p_spoof) * 0.99
    p_nontarget: float = 0.0095  # (1 - p_spoof) * 0.01
    c_miss: float = 1.0
    c_fa: float = 10.0
    c_miss_asv: float = 1.0
    c_fa_asv: float = 10.0
    c_miss_cm: float = 1.0
    c_fa_cm: float = 10.0
    c_fa_spoof: float = 10.0

    def validate(self) -> None:
        if min(self.c_fa, self.c_miss, self.c_fa_cm, self.c_miss_cm) < 0:
            raise ValueError("cost values must be positive")
        if (
            min(self.p_target, self.p_nontarget, self.p_spoof) < 0
            or abs(self.p_target + self.p_nontarget + self.p_spoof - 1.0) > 1e-10
        ):
            raise ValueError("priors must be positive and sum to one")


ASVSPOOF19_LA_COST_MODEL = CostModel()
ASVSPOOF19_LA_COST_MODEL_REVISED = CostModel()


def compute_det_curve(
    target_scores: np.ndarray, nontarget_scores: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Detection error tradeoff sweep.

    Returns ``(frr, far, thresholds)`` of length ``n_target + n_nontarget + 1``.
    Matches the reference algorithm exactly (stable mergesort; leading point
    ``(frr=0, far=1)`` at threshold ``min(score) - 0.001``).
    """
    target_scores = np.asarray(target_scores, dtype=np.float64)
    nontarget_scores = np.asarray(nontarget_scores, dtype=np.float64)
    n_tar = target_scores.size
    n_non = nontarget_scores.size
    if n_tar == 0 or n_non == 0:
        raise ValueError("need at least one target and one nontarget score")

    scores = np.concatenate([target_scores, nontarget_scores])
    is_target = np.concatenate(
        [np.ones(n_tar, dtype=np.float64), np.zeros(n_non, dtype=np.float64)]
    )
    order = np.argsort(scores, kind="mergesort")  # stable: targets before nontargets on ties
    is_target = is_target[order]

    # After rejecting everything <= threshold k: missed targets / accepted nontargets.
    miss_counts = np.cumsum(is_target)
    fa_counts = n_non - (np.arange(1, n_tar + n_non + 1) - miss_counts)

    frr = np.concatenate([[0.0], miss_counts / n_tar])
    far = np.concatenate([[1.0], fa_counts / n_non])
    thresholds = np.concatenate([[scores[order[0]] - 0.001], scores[order]])
    return frr, far, thresholds


def compute_eer(
    target_scores: np.ndarray, nontarget_scores: np.ndarray
) -> Tuple[float, float]:
    """Equal error rate and its threshold (reference argmin |frr - far| rule)."""
    frr, far, thresholds = compute_det_curve(target_scores, nontarget_scores)
    idx = int(np.argmin(np.abs(frr - far)))
    eer = float((frr[idx] + far[idx]) / 2.0)
    return eer, float(thresholds[idx])


def compute_eer_minflip(
    bonafide_scores: np.ndarray, spoof_scores: np.ndarray
) -> float:
    """EER (%) robust to score-sign convention: min over both polarities.

    Mirrors `/root/reference/src/report_2021df_codec_breakdown.py:10-38` which
    the 2021-DF breakdown reports use.
    """
    bonafide_scores = np.asarray(bonafide_scores, dtype=np.float64)
    spoof_scores = np.asarray(spoof_scores, dtype=np.float64)
    if bonafide_scores.size == 0 or spoof_scores.size == 0:
        return float("nan")
    eer_pos = compute_eer(bonafide_scores, spoof_scores)[0]
    eer_neg = compute_eer(-bonafide_scores, -spoof_scores)[0]
    return 100.0 * min(eer_pos, eer_neg)


def obtain_asv_error_rates(
    tar_asv: np.ndarray,
    non_asv: np.ndarray,
    spoof_asv: np.ndarray,
    asv_threshold: float,
) -> Tuple[float, float, Optional[float], Optional[float]]:
    """ASV operating-point error rates at a fixed threshold.

    Returns ``(Pfa_asv, Pmiss_asv, Pmiss_spoof_asv, Pfa_spoof_asv)``.
    """
    tar_asv = np.asarray(tar_asv, dtype=np.float64)
    non_asv = np.asarray(non_asv, dtype=np.float64)
    spoof_asv = np.asarray(spoof_asv, dtype=np.float64)
    p_fa = float(np.sum(non_asv >= asv_threshold) / non_asv.size)
    p_miss = float(np.sum(tar_asv < asv_threshold) / tar_asv.size)
    if spoof_asv.size == 0:
        return p_fa, p_miss, None, None
    p_miss_spoof = float(np.sum(spoof_asv < asv_threshold) / spoof_asv.size)
    p_fa_spoof = float(np.sum(spoof_asv >= asv_threshold) / spoof_asv.size)
    return p_fa, p_miss, p_miss_spoof, p_fa_spoof


def _sanity_check_scores(bona: np.ndarray, spoof: np.ndarray) -> None:
    combined = np.concatenate([bona, spoof])
    if np.isnan(combined).any() or np.isinf(combined).any():
        raise ValueError("scores contain nan or inf")
    if np.unique(combined).size < 3:
        raise ValueError("provide soft CM scores, not binary decisions")


def compute_tdcf_legacy(
    bonafide_score_cm: np.ndarray,
    spoof_score_cm: np.ndarray,
    p_fa_asv: float,
    p_miss_asv: float,
    p_miss_spoof_asv: Optional[float],
    cost_model: CostModel = ASVSPOOF19_LA_COST_MODEL,
) -> Tuple[np.ndarray, np.ndarray]:
    """Legacy (ASVspoof-2019) normalized t-DCF curve over all CM thresholds.

    ``tDCF(s) = C1 * Pmiss_cm(s) + C2 * Pfa_cm(s)``, normalized by ``min(C1, C2)``.
    Semantics of `/root/reference/src/evaluation.py:163-335`.
    """
    cost_model.validate()
    if p_miss_spoof_asv is None:
        raise ValueError("need the miss rate of spoof trials against the ASV system")
    bona = np.asarray(bonafide_score_cm, dtype=np.float64)
    spoof = np.asarray(spoof_score_cm, dtype=np.float64)
    _sanity_check_scores(bona, spoof)

    p_miss_cm, p_fa_cm, thresholds = compute_det_curve(bona, spoof)

    c1 = (
        cost_model.p_target * (cost_model.c_miss_cm - cost_model.c_miss_asv * p_miss_asv)
        - cost_model.p_nontarget * cost_model.c_fa_asv * p_fa_asv
    )
    c2 = cost_model.c_fa_cm * cost_model.p_spoof * (1.0 - p_miss_spoof_asv)
    if c1 < 0 or c2 < 0:
        raise ValueError("negative t-DCF weights; check the ASV error rates")

    tdcf_norm = (c1 * p_miss_cm + c2 * p_fa_cm) / min(c1, c2)
    return tdcf_norm, thresholds


def compute_tdcf_revised(
    bonafide_score_cm: np.ndarray,
    spoof_score_cm: np.ndarray,
    p_fa_asv: float,
    p_miss_asv: float,
    p_fa_spoof_asv: Optional[float],
    cost_model: CostModel = ASVSPOOF19_LA_COST_MODEL_REVISED,
) -> Tuple[np.ndarray, np.ndarray]:
    """Revised (TASLP-2020) normalized t-DCF curve.

    ``tDCF(s) = C0 + C1 * Pmiss_cm(s) + C2 * Pfa_cm(s)``, normalized by
    ``C0 + min(C1, C2)``.  Semantics of
    `/root/reference/tDCF_python_v2/eval_metrics.py:51-196`.
    """
    cost_model.validate()
    if p_fa_spoof_asv is None:
        raise ValueError("need the false-alarm rate of spoof trials against the ASV system")
    bona = np.asarray(bonafide_score_cm, dtype=np.float64)
    spoof = np.asarray(spoof_score_cm, dtype=np.float64)
    _sanity_check_scores(bona, spoof)

    p_miss_cm, p_fa_cm, thresholds = compute_det_curve(bona, spoof)

    c0 = (
        cost_model.p_target * cost_model.c_miss * p_miss_asv
        + cost_model.p_nontarget * cost_model.c_fa * p_fa_asv
    )
    c1 = cost_model.p_target * cost_model.c_miss - c0
    c2 = cost_model.p_spoof * cost_model.c_fa_spoof * p_fa_spoof_asv
    if c0 < 0 or c1 < 0 or c2 < 0:
        raise ValueError("negative t-DCF weights; check the ASV error rates")

    tdcf_default = c0 + min(c1, c2)
    tdcf_norm = (c0 + c1 * p_miss_cm + c2 * p_fa_cm) / tdcf_default
    return tdcf_norm, thresholds


def compute_eer_jax(target_scores, nontarget_scores) -> Tuple[float, float]:
    """Vectorized jnp EER for on-device scoring of large trial lists.

    Same sweep as :func:`compute_eer`; uses a tie-stable key so results match
    the numpy mergesort path exactly.  Returns ``(eer, threshold)`` as jnp
    scalars (jit-friendly; shapes static).
    """
    import jax.numpy as jnp

    tar = jnp.asarray(target_scores, dtype=jnp.float64 if _x64() else jnp.float32)
    non = jnp.asarray(nontarget_scores, dtype=tar.dtype)
    n_tar, n_non = tar.shape[0], non.shape[0]
    scores = jnp.concatenate([tar, non])
    is_target = jnp.concatenate(
        [jnp.ones(n_tar, scores.dtype), jnp.zeros(n_non, scores.dtype)]
    )
    # Stable order: sort by (score, original index) — ties keep targets first,
    # matching numpy's stable mergesort on the concatenated array.
    idx = jnp.arange(n_tar + n_non)
    order = jnp.lexsort((idx, scores))
    sorted_is_target = is_target[order]
    sorted_scores = scores[order]

    miss = jnp.cumsum(sorted_is_target)
    fa = n_non - (jnp.arange(1, n_tar + n_non + 1) - miss)
    frr = jnp.concatenate([jnp.zeros(1, scores.dtype), miss / n_tar])
    far = jnp.concatenate([jnp.ones(1, scores.dtype), fa / n_non])
    thresholds = jnp.concatenate([sorted_scores[:1] - 0.001, sorted_scores])

    k = jnp.argmin(jnp.abs(frr - far))
    return (frr[k] + far[k]) / 2.0, thresholds[k]


def _x64() -> bool:
    import jax

    return bool(jax.config.read("jax_enable_x64"))
