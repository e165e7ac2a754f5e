#!/usr/bin/env bash
# LatteCLIP unsupervised fine-tune: stanford_cars (run definition parity with the
# reference scripts/unsupervised/stanford_cars_fine_tune_multiclass.sh)
# usage: stanford_cars_fine_tune_multiclass.sh LR CLASS_PER_IMAGE SEED EXP_NAME
set -euo pipefail
LR=${1:?lr}; K=${2:?class_per_image}; SEED=${3:?seed}; PREFIX=${4:?exp name}
: "${LATTECLIP_DATA_DIR:?set LATTECLIP_DATA_DIR}"
P="$LATTECLIP_DATA_DIR/stanford_cars_preprocess"

python -m latteclip_tpu.train.main \
  --train-data "$P/webdataset/train_tar/{00000..00081}.tar" \
  --clip-prediction-path "$P/clip_features_train.pkl" \
  --generated-captions-path "$P/generated_captions/train_classname_stanford_cars_77_llava-v1.6-mistral-7b_4bit" \
  --generated-common-captions-path "$P/generated_captions/train_stanford_cars_describe_common_v3_77_llava-v1.6-mistral-7b_4bit" \
  --zeroshot-eval-data stanford_cars \
  --eval-preprocess-path "$P" \
  --train-num-samples 8144 \
  --epochs 50 \
  --warmup 20 \
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
