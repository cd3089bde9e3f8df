#!/usr/bin/env bash
# Fetch the published SuDoRM-RF checkpoints (zenodo DOI 10.5281/zenodo.6299852,
# same artifacts the reference distributes) for use with
# sudo_rm_rf_tpu.convert / sudo-tpu-separate / sudo-tpu-evaluate.
set -euo pipefail
OUT_DIR="${1:-pretrained_models}"
mkdir -p "$OUT_DIR"
BASE="https://zenodo.org/record/6299852/files"
for f in \
  GroupCom_Sudormrf_U8_Bases512_WSJ02mix.pt \
  Improved_Sudormrf_U16_Bases512_WSJ02mix.pt \
  Improved_Sudormrf_U16_Bases2048_WHAMRexclmark.pt \
  Improved_Sudormrf_U36_Bases2048_WSJ02mix.pt \
  Improved_Sudormrf_U36_Bases4096_WHAMRexclmark.pt; do
  wget -c --tries=0 -O "$OUT_DIR/$f" "$BASE/$f?download=1"
done
echo "checkpoints in $OUT_DIR — load via sudo_rm_rf_tpu.convert.load_pt_file"
