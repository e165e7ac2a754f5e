"""HF architecture registry: per-model-type config attribute names + default
pooler (counterpart of reference ``src/open_clip/hf_configs.py:3-79``).

Every entry has a native JAX tower in ``models/hf_text.py``: the BERT
family (bert / roberta / xlm-roberta) as post-LN masked encoders, and the
encoder-decoder families exactly as the reference consumes them — the
ENCODER side only (``AutoModel(...).encoder``, reference
hf_model.py:124-126): mt5 as the T5 encoder stack, m2m_100 (NLLB) as the
fairseq-style pre-LN encoder.
"""

_ENCODER_NAMES = {
    "context_length": "max_position_embeddings",
    "vocab_size": "vocab_size",
    "width": "hidden_size",
    "heads": "num_attention_heads",
    "layers": "num_hidden_layers",
    "layer_attr": "layer",
    "token_embeddings_attr": "embeddings",
}

arch_dict = {
    "roberta": {"config_names": dict(_ENCODER_NAMES), "pooler": "mean_pooler"},
    "xlm-roberta": {"config_names": dict(_ENCODER_NAMES), "pooler": "mean_pooler"},
    "bert": {"config_names": dict(_ENCODER_NAMES), "pooler": "cls_pooler"},
    "mt5": {
        "config_names": {
            "context_length": "",
            "vocab_size": "vocab_size",
            "width": "d_model",
            "heads": "num_heads",
            "layers": "num_layers",
            "layer_attr": "block",
            "token_embeddings_attr": "embed_tokens",
        },
        "pooler": "mean_pooler",
    },
    "m2m_100": {
        "config_names": {
            "context_length": "max_position_embeddings",
            "vocab_size": "vocab_size",
            "width": "d_model",
            "heads": "encoder_attention_heads",
            "layers": "encoder_layers",
        },
        "pooler": "cls_pooler",
    },
}

# model types the native JAX tower implements
SUPPORTED_MODEL_TYPES = ("bert", "roberta", "xlm-roberta", "mt5", "m2m_100")
