"""Language stack: JAX RoBERTa, tokenizers, span predictor."""

from butd_detr_tpu.lang.roberta import (
    RobertaConfig,
    RobertaModel,
    convert_hf_roberta_state_dict,
    roberta_base_config,
    small_text_roberta_config,
    tiny_roberta_config,
)
from butd_detr_tpu.lang.span_predictor import (
    SpanPredictor,
    scores_to_pred_spans,
    span_bce_loss,
)
from butd_detr_tpu.lang.span_trainer import (
    SpanTextDataset,
    SpanTrainer,
    batch_iter,
    run_span_training,
)
from butd_detr_tpu.lang.tokenizer import (
    HFTokenizer,
    SimpleTokenizer,
    Tokenized,
    get_tokenizer,
)

__all__ = [
    "HFTokenizer",
    "RobertaConfig",
    "RobertaModel",
    "SimpleTokenizer",
    "SpanPredictor",
    "SpanTextDataset",
    "SpanTrainer",
    "Tokenized",
    "batch_iter",
    "run_span_training",
    "convert_hf_roberta_state_dict",
    "get_tokenizer",
    "roberta_base_config",
    "small_text_roberta_config",
    "scores_to_pred_spans",
    "span_bce_loss",
    "tiny_roberta_config",
]
