"""Scoring and metrics (EER / t-DCF / 2021-DF breakdowns)."""

from .metrics import (
    ASVSPOOF19_LA_COST_MODEL,
    CostModel,
    compute_det_curve,
    compute_eer,
    compute_eer_jax,
    compute_eer_minflip,
    compute_tdcf_legacy,
    compute_tdcf_revised,
    obtain_asv_error_rates,
)
from .scoring import calculate_tdcf_eer, load_asv_scores, load_cm_scores
from .eval2021 import (
    calculate_eer_2021,
    codec_breakdown,
    load_score_file,
    load_trial_metadata,
    write_codec_breakdown_report,
)
