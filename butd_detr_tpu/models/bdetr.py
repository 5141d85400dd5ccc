"""BeaUTyDETR: the flagship 3D language-grounding model, TPU-native.

Rebuild of reference `models/bdetr.py:28-319`. One pure function of
fixed-shape arrays: point cloud + tokenized text (+ optional detected-box
stream) -> `end_points` dict with the reference's key schema
(per-layer-prefixed predictions), so losses/evaluators are drop-in.

Differences by design (SURVEY.md section 7):
  * tokenization happens in the input pipeline, the model takes
    `text_ids`/`text_mask` arrays (reference tokenizes in-forward,
    bdetr.py:164-167);
  * RoBERTa runs in JAX (frozen: stop_gradient on its output + optimizer
    mask, matching requires_grad=False at bdetr.py:76-77);
  * features are channels-last everywhere.

Quirk kept for parity: the reference's `butd_class_embeddings.requires_grad
= False` (bdetr.py:92) sets a plain module attribute, NOT the weight's
requires_grad — the class-name embedding table actually trains. We
therefore keep it trainable too (initialized from class_embeddings3d.npy
when provided).
"""

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from butd_detr_tpu.lang.roberta import RobertaConfig, RobertaModel
from butd_detr_tpu.models.decoder import BiDecoderLayer
from butd_detr_tpu.models.encoder import BiEncoder, LN_EPS
from butd_detr_tpu.models.heads import (
    ClsAgnosticPredictHead,
    PointsObjClsModule,
    general_sampling,
)
from butd_detr_tpu.nn.backbone import Pointnet2Backbone
from butd_detr_tpu.nn.position import PositionEmbeddingLearned


def l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(
        jnp.linalg.norm(x, axis=axis, keepdims=True), eps
    )


class ContrastiveProjection(nn.Module):
    """3-layer MLP to the 64-d contrastive space (bdetr.py:138-151)."""

    d_model: int = 288
    out_dim: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.d_model, dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(self.d_model, dtype=self.dtype)(x))
        return nn.Dense(self.out_dim, dtype=self.dtype)(x)


class BeaUTyDETR(nn.Module):
    num_class: int = 256
    num_obj_class: int = 485
    input_feature_dim: int = 3
    num_queries: int = 256
    num_encoder_layers: int = 3
    num_decoder_layers: int = 6
    self_position_embedding: str = "loc_learned"
    contrastive_align_loss: bool = True
    d_model: int = 288
    butd: bool = True
    self_attend: bool = True
    text_hidden: int = 768  # RoBERTa hidden size
    box_emb_dim: int = 128  # split of d_model for the box stream (bdetr.py:93-94)
    roberta: Optional[RobertaConfig] = None  # None => text feats provided
    # reference bdetr.py:76-77 freezes the trunk unconditionally; False
    # lets gradients flow (pair with Config.freeze_text_encoder=False so
    # the optimizer actually trains it)
    freeze_text: bool = True
    # backbone scaling knobs (tests use smaller schedules)
    backbone_npoints: tuple = (2048, 1024, 512, 256)
    dtype: jnp.dtype = jnp.float32
    # compute dtype for the PointNet++ MLP stacks only (None => dtype).
    # bf16 here halves the HBM traffic of the grouped (B, np, ns, C)
    # intermediates — the backbone is bandwidth-bound, not FLOP-bound —
    # while BatchNorm statistics and all geometry (FPS/ball query/xyz)
    # stay f32. Cast back to `dtype` at the fp2 boundary.
    backbone_dtype: Optional[jnp.dtype] = None
    # the input cloud is stored in spatially local (Hilbert) order by the
    # data pipeline (data/scan.py); sa1's ball query then skips its two
    # device prep sorts. Exactness never depends on this claim.
    input_presorted: bool = False
    # f32/HIGHEST attention matmuls for strict-parity studies; None (the
    # default) resolves to the bf16 single-pass kernel unless the
    # BUTD_ATTN_PRECISE env var overrides. Threaded from
    # Config.attn_precise so the choice keys the jit cache.
    attn_precise: Optional[bool] = None

    @nn.compact
    def __call__(self, inputs: Dict[str, Any], *, train: bool = False):
        d = self.d_model
        end_points: Dict[str, jnp.ndarray] = {}

        # ---------------- visual backbone (bdetr.py:156-162)
        ep = Pointnet2Backbone(
            input_feature_dim=self.input_feature_dim,
            output_dim=d,
            npoints=self.backbone_npoints,
            input_presorted=self.input_presorted,
            dtype=self.backbone_dtype or self.dtype, name="backbone_net",
        )(inputs["point_clouds"], train=train)
        ep = {
            k: (v.astype(self.dtype)
                if hasattr(v, "dtype") and v.dtype != jnp.int32
                and v.dtype != self.dtype else v)
            for k, v in ep.items()
        }
        end_points.update(ep)
        end_points["seed_inds"] = ep["fp2_inds"]
        end_points["seed_xyz"] = ep["fp2_xyz"]
        end_points["seed_features"] = ep["fp2_features"]

        # ---------------- text backbone (frozen) + projector (bdetr.py:163-174)
        if self.roberta is not None:
            text_hidden_states = RobertaModel(
                self.roberta, dtype=self.dtype,
                attn_precise=self.attn_precise, name="text_encoder",
            )(inputs["text_ids"], inputs["text_mask"], train=False)
            # requires_grad=False parity: no grads into the trunk. This
            # also prunes the whole RoBERTa backward from the train step
            # and keeps frozen-text grads out of the clip norm (reference
            # frozen params have grad=None, excluded from clipping).
            if self.freeze_text:
                text_hidden_states = jax.lax.stop_gradient(
                    text_hidden_states
                )
        else:
            text_hidden_states = inputs["text_hidden_states"]
        text_feats = nn.Dense(d, dtype=self.dtype, name="text_projector")(
            text_hidden_states
        )
        text_feats = nn.LayerNorm(
            epsilon=1e-12, dtype=jnp.float32, name="text_projector_ln",
        )(text_feats)
        text_feats = nn.Dropout(0.1, deterministic=not train)(text_feats)
        # True == PAD (inverted HF mask, bdetr.py:169-171)
        text_padding_mask = inputs["text_mask"] == 0
        end_points["text_feats"] = text_feats
        end_points["text_attention_mask"] = text_padding_mask

        points_xyz = end_points["fp2_xyz"]
        points_features = end_points["fp2_features"]

        # ---------------- detected-box stream (bdetr.py:86-94,217-228)
        detected_feats = detected_mask = None
        if self.butd:
            box_emb = PositionEmbeddingLearned(
                self.box_emb_dim, dtype=self.dtype, name="box_embeddings",
            )(inputs["det_boxes"], train=train)  # (B, D, box_emb_dim)
            cls_table = self.param(
                "butd_class_embeddings",
                nn.initializers.normal(0.02),
                (self.num_obj_class, self.text_hidden),
            )
            cls_emb = jnp.take(
                cls_table, inputs["det_class_ids"], axis=0
            )  # (B, D, 768)
            cls_emb = nn.Dense(
                d - self.box_emb_dim, dtype=self.dtype,
                name="class_embeddings",
            )(cls_emb)
            detected_feats = jnp.concatenate([box_emb, cls_emb], axis=-1)
            detected_mask = ~inputs["det_bbox_label_mask"]  # True == PAD

        # ---------------- cross-modal encoder (bdetr.py:96-104,230-242)
        pos_feats = PositionEmbeddingLearned(
            d, dtype=self.dtype, name="pos_embed",
        )(points_xyz, train=train)
        vis_padding_mask = jnp.zeros(points_xyz.shape[:2], bool)
        points_features, text_feats = BiEncoder(
            num_layers=self.num_encoder_layers, d_model=d, n_heads=8,
            dim_feedforward=256,
            dropout=0.1, self_attend=self.self_attend,
            use_butd_enc_attn=self.butd, dtype=self.dtype,
            attn_precise=self.attn_precise, name="cross_encoder",
        )(points_features, pos_feats, vis_padding_mask, text_feats,
          text_padding_mask, detected_feats, detected_mask, train=train)
        end_points["text_memory"] = text_feats
        end_points["seed_features"] = points_features

        if self.contrastive_align_loss:
            end_points["proj_tokens"] = l2_normalize(
                ContrastiveProjection(
                    d, 64, dtype=self.dtype,
                    name="contrastive_align_projection_text",
                )(text_feats)
            )

        # ---------------- query selection (kps, bdetr.py:177-191)
        points_obj_cls_logits = PointsObjClsModule(
            d, dtype=self.dtype, name="points_obj_cls",
        )(points_features, train=train)
        end_points["seeds_obj_cls_logits"] = points_obj_cls_logits  # (B, K)
        _, sample_inds = jax.lax.top_k(
            points_obj_cls_logits, self.num_queries
        )
        sample_inds = sample_inds.astype(jnp.int32)
        cluster_xyz, cluster_feature, sample_inds = general_sampling(
            points_xyz, points_features, sample_inds
        )
        end_points["query_points_xyz"] = cluster_xyz
        end_points["query_points_feature"] = cluster_feature
        end_points["query_points_sample_inds"] = sample_inds

        query = nn.Dense(d, dtype=self.dtype, name="decoder_query_proj")(
            cluster_feature
        )

        proj_queries_mlp = (
            ContrastiveProjection(
                d, 64, dtype=self.dtype,
                name="contrastive_align_projection_image",
            )
            if self.contrastive_align_loss
            else None
        )
        # proj_queries for ALL prefixes are computed in ONE batched MLP
        # application after the decoder loop (the projection is a single
        # shared-parameter module, bdetr.py:143-151, and rows are
        # independent) — 7 serial small-matmul chains -> 1. Collected here.
        proj_inputs = [query] if proj_queries_mlp is not None else None

        # ---------------- proposal head (bdetr.py:266-272)
        proposal = ClsAgnosticPredictHead(
            self.num_class, d, dtype=self.dtype, name="proposal_head",
        )(cluster_feature, cluster_xyz, train=train)
        for k, v in proposal.items():
            end_points["proposal_" + k] = v
        base_xyz = jax.lax.stop_gradient(proposal["center"])
        base_size = jax.lax.stop_gradient(proposal["pred_size"])

        # ---------------- decoder (bdetr.py:277-317)
        for i in range(self.num_decoder_layers):
            prefix = (
                "last_" if i == self.num_decoder_layers - 1 else f"{i}head_"
            )
            if self.self_position_embedding == "none":
                query_pos = None
            elif self.self_position_embedding == "xyz_learned":
                query_pos = base_xyz
            else:  # loc_learned
                query_pos = jnp.concatenate([base_xyz, base_size], axis=-1)

            query = BiDecoderLayer(
                d, n_heads=8, dim_feedforward=256, dropout=0.1,
                self_position_embedding=self.self_position_embedding,
                butd=self.butd, dtype=self.dtype,
                attn_precise=self.attn_precise, name=f"decoder_{i}",
            )(query, points_features, text_feats, query_pos, None,
              text_padding_mask, detected_feats, detected_mask, train=train)

            if proj_inputs is not None:
                proj_inputs.append(query)

            pred = ClsAgnosticPredictHead(
                self.num_class, d, dtype=self.dtype,
                name=f"prediction_head_{i}",
            )(query, cluster_xyz, train=train)
            for k, v in pred.items():
                end_points[prefix + k] = v
            base_xyz = jax.lax.stop_gradient(pred["center"])
            base_size = jax.lax.stop_gradient(pred["pred_size"])

        if proj_inputs is not None:
            # (B, (1+num_layers)*V, d): one matmul family instead of 7.
            # Row-independent (Dense+relu only, no BN/dropout), so outputs
            # are identical to per-prefix application.
            stacked = jnp.concatenate(proj_inputs, axis=1)
            proj = l2_normalize(proj_queries_mlp(stacked))
            V = self.num_queries
            names = ["proposal_"] + [
                ("last_" if i == self.num_decoder_layers - 1
                 else f"{i}head_")
                for i in range(self.num_decoder_layers)
            ]
            for j, prefix in enumerate(names):
                end_points[f"{prefix}proj_queries"] = proj[
                    :, j * V:(j + 1) * V
                ]

        return end_points


def prediction_prefixes(num_decoder_layers: int):
    """['proposal_', '0head_', ..., 'last_'] (losses.py:549-550)."""
    return (
        ["proposal_"]
        + [f"{i}head_" for i in range(num_decoder_layers - 1)]
        + ["last_"]
    )
