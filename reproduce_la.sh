#!/usr/bin/env bash
# reproduce_la.sh — one-shot reproduction of the reference's headline result
# (Phase-6 Bi-Mamba + LoRA: 4.42 % clean / 4.03 % compressed EER on
#  ASVspoof 2019 LA eval, /root/reference/README.md:92) on TPU.
#
# Prerequisites the operator must provide (this environment has neither):
#   1. The ASVspoof 2019 LA dataset (https://datashare.ed.ac.uk/handle/10283/3336)
#      — step 1 downloads it when absent, same source as the reference's
#      utils/download_dataset.py.
#   2. A HuggingFace microsoft/wavlm-large snapshot directory (config.json +
#      pytorch_model.bin or model.safetensors), e.g. via
#      `huggingface-cli download microsoft/wavlm-large --local-dir $WAVLM_DIR`.
#      The reference downloads this implicitly at model construction
#      (src/models/DualStreamSEMamba.py:295-317); TPU training converts the
#      torch weights to the Flax layout on load (rade_tpu/nn/wavlm_convert.py,
#      parity-tested at the real wavlm-large geometry in
#      tests/test_convert_real_arch.py).
#
# Usage:
#   DB=/path/to/LA WAVLM_DIR=/path/to/wavlm-large bash reproduce_la.sh
#
# Optional:
#   OUT=exp_result            output root
#   EPOCHS=50                 override num_epochs
#   SEED=1234
#
# Expected artifacts in $OUT/<model-tag>/ when done:
#   metric_log.txt                      per-epoch loss/dev-EER/dev-tDCF
#   metrics/scalars.jsonl               machine-readable training curve
#   metrics/t-DCF_EER_*epo.txt          clean eval reports at each new best
#   metrics/t-DCF_EER_compressed_*.txt  compressed-protocol eval reports
#   eval_scores_phase6.txt              clean eval CM scores (71,237 rows)
#   compressed_eval_scores_phase6.txt   compressed-protocol CM scores
#   swa_eval_scores_phase6.txt          final SWA-swapped eval scores
#   metrics/t-DCF_EER_swa[_compressed].txt
#   weights/{epoch_*.ckpt,best.ckpt,swa.ckpt}  full train states (msgpack)
#   report_2021df_codec.md              only if database_path_2021 is set
#
# The clean and compressed EER are the numbers to compare against
# README.md:92 (4.42 / 4.03).  Which links of that chain are PROVEN in this
# repo versus awaiting real data is enumerated in docs/PARITY.md
# ("Parity-evidence chain for the headline numbers").

set -euo pipefail
cd "$(dirname "$0")"

DB="${DB:?set DB=/path/to/ASVspoof2019/LA}"
WAVLM_DIR="${WAVLM_DIR:?set WAVLM_DIR=/path/to/hf/wavlm-large}"
OUT="${OUT:-exp_result}"
SEED="${SEED:-1234}"

# ---- 1. dataset: download when absent, then integrity-check ---------------
if [ ! -d "$DB/ASVspoof2019_LA_train" ]; then
  echo "== downloading ASVspoof 2019 LA to $DB (reference semantics:"
  echo "   utils/download_dataset.py -> datashare.ed.ac.uk LA.zip) =="
  python -m rade_tpu.tools.download_dataset --out "$DB"
fi
echo "== checking dataset integrity (every flac readable, 16 kHz) =="
python -m rade_tpu.tools.check_dataset --database_path "$DB"

# ---- 2. wavlm-large checkpoint sanity --------------------------------------
test -f "$WAVLM_DIR/config.json" || {
  echo "WAVLM_DIR=$WAVLM_DIR has no config.json (need a HF wavlm-large snapshot)"; exit 1; }

# ---- 3. build the run config ----------------------------------------------
# Phase6_TPU.conf is the shipped TPU recipe (= the reference's
# src/config/Phase6_Proposed.conf hyper-parameters + TPU execution knobs).
# Inject the operator's paths + turn on the compressed-protocol eval so the
# run reports BOTH headline columns.
RUN_CONF="configs/Phase6_Reproduce.conf"
python - "$DB" "$WAVLM_DIR" "$RUN_CONF" "${EPOCHS:-}" <<'PY'
import json, sys
db, wavlm, out, epochs = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
cfg = json.load(open("configs/Phase6_TPU.conf"))
cfg["database_path"] = db
cfg["asv_score_path"] = (
    db + "/ASVspoof2019_LA_asv_scores/ASVspoof2019.LA.asv.eval.gi.trl.scores.txt"
)
cfg["model_config"]["wavlm_pretrained"] = wavlm
cfg["eval_all_best"] = "True"
cfg.setdefault("test_config", {})["eval_compressed"] = True
if epochs:
    cfg["num_epochs"] = int(epochs)
json.dump(cfg, open(out, "w"), indent=2)
print(f"wrote {out} (num_epochs={cfg['num_epochs']})")
PY

# ---- 4. train (epoch loop: dev scoring, best-ckpt, SWA, EMA; see
#         rade_tpu/train/loop.py) -------------------------------------------
python -m rade_tpu.main --config "$RUN_CONF" --output_dir "$OUT" --seed "$SEED"

# ---- 5. stand-alone eval of the best checkpoint (clean + compressed) ------
TAG=$(python - "$RUN_CONF" <<'PY'
import sys
from rade_tpu.config import load_config
print(load_config(sys.argv[1]).model_tag(sys.argv[1], ""))
PY
)
BEST="$OUT/$TAG/weights/best.ckpt"
if [ -f "$BEST" ]; then
  python -m rade_tpu.main --config "$RUN_CONF" --eval \
    --eval_model_weights "$BEST" --output_dir "$OUT/$TAG"
fi

echo "== done; compare the clean/compressed EER above against"
echo "   README.md:92 of the reference (4.42 % / 4.03 %) =="
