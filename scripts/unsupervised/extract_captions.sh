#!/usr/bin/env bash
# Fan out offline LLaVA caption generation across processes
# usage: extract_captions.sh DATASET MODE NUM_PROCS
set -euo pipefail
DS=${1:?dataset}; MODE=${2:?per_image|per_group}; W=${3:?world size}
: "${LATTECLIP_DATA_DIR:?set LATTECLIP_DATA_DIR}"
P="$LATTECLIP_DATA_DIR/${DS}_preprocess"
if [ "$MODE" = per_image ]; then
  OUT="$P/generated_captions/train_classname_${DS}_77_llava-v1.6-mistral-7b_4bit"
else
  OUT="$P/generated_captions/train_${DS}_describe_common_v3_77_llava-v1.6-mistral-7b_4bit"
fi
for ((i=0; i<W; i++)); do
  python -m latteclip_tpu.preprocess.captions \
    --mode "$MODE" --dataset "$DS" \
    --data-dir "$P/webdataset" --output-dir "$OUT" \
    --clip-prediction-path "$P/clip_features_train.pkl" \
    --process-id "$i" --world-size "$W" &
done
wait
