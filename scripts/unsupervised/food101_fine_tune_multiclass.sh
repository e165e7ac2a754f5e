#!/usr/bin/env bash
# LatteCLIP unsupervised fine-tune: food101 (run definition parity with the
# reference scripts/unsupervised/food101_fine_tune_multiclass.sh)
# usage: food101_fine_tune_multiclass.sh LR CLASS_PER_IMAGE SEED EXP_NAME
set -euo pipefail
LR=${1:?lr}; K=${2:?class_per_image}; SEED=${3:?seed}; PREFIX=${4:?exp name}
: "${LATTECLIP_DATA_DIR:?set LATTECLIP_DATA_DIR}"
P="$LATTECLIP_DATA_DIR/food101_preprocess"

python -m latteclip_tpu.train.main \
  --train-data "$P/webdataset/train_tar/{00000..00706}.tar" \
  --clip-prediction-path "$P/clip_features_train.pkl" \
  --generated-captions-path "$P/generated_captions/train_classname_food101_77_llava-v1.6-mistral-7b_4bit" \
  --generated-common-captions-path "$P/generated_captions/train_food101_describe_common_v3_77_llava-v1.6-mistral-7b_4bit" \
  --zeroshot-eval-data food101 \
  --eval-preprocess-path "$P" \
  --train-num-samples 70700 \
  --epochs 15 \
  --warmup 140 \
  --batch-size 512 \
  --precision bf16 \
  --workers 8 \
  --lr "$LR" \
  --logs logs \
  --resume latest \
  --zeroshot-frequency 1 \
  --model ViT-B-32 \
  --pretrained "$LATTECLIP_DATA_DIR/checkpoints/ViT-B-32_laion2b_s34b_b79k.pt" \
  --class-per-image "$K" \
  --alpha 0.01 \
  --seed "$SEED" \
  --name "${PREFIX}_seed${SEED}_${K}_lr${LR}"
