#!/usr/bin/env bash
# Preprocess fgvc_aircraft: dataset -> webdataset -> tar shards -> pseudo-labels
# (pipeline parity with reference scripts/preprocess/preprocess_fgvc_aircraft.sh)
set -euo pipefail
: "${LATTECLIP_DATA_DIR:?set LATTECLIP_DATA_DIR}"
SRC="$LATTECLIP_DATA_DIR/fgvc_aircraft"
P="$LATTECLIP_DATA_DIR/fgvc_aircraft_preprocess"

python -m latteclip_tpu.preprocess.to_webdataset --dataset fgvc_aircraft --dataset-dir "$SRC" --preprocess-dir "$P"
python -m latteclip_tpu.preprocess.create_tarfiles --input-dir "$P/webdataset/train" --output-dir "$P/webdataset/train_tar"
python -m latteclip_tpu.preprocess.create_tarfiles --input-dir "$P/webdataset/val" --output-dir "$P/webdataset/val_tar"

# frozen-CLIP pseudo-labels for both splits (feeds captioning + training)
for SPLIT in train val; do
  python -m latteclip_tpu.train.main \
    --zeroshot-eval-data fgvc_aircraft \
    --eval-preprocess-path "$P" \
    --model ViT-B-32 \
    --pretrained "$LATTECLIP_DATA_DIR/checkpoints/ViT-B-32_laion2b_s34b_b79k.pt" \
    --batch-size 64 \
    --extract-features-path "$P" \
    --extract-features-split "$SPLIT"
done
