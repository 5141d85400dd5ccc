"""Model family: BeaUTyDETR and its encoder/decoder/head components."""

from butd_detr_tpu.models.bdetr import BeaUTyDETR, prediction_prefixes
from butd_detr_tpu.models.decoder import BiDecoderLayer
from butd_detr_tpu.models.encoder import (
    BiEncoder,
    BiEncoderLayer,
    CrossAttentionLayer,
)
from butd_detr_tpu.models.heads import (
    ClsAgnosticPredictHead,
    PointsObjClsModule,
    ThreeLayerMLP,
    general_sampling,
)

__all__ = [
    "BeaUTyDETR",
    "BiDecoderLayer",
    "BiEncoder",
    "BiEncoderLayer",
    "ClsAgnosticPredictHead",
    "CrossAttentionLayer",
    "PointsObjClsModule",
    "ThreeLayerMLP",
    "general_sampling",
    "prediction_prefixes",
]
