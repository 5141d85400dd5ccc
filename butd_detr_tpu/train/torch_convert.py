"""Convert released PyTorch BUTD-DETR checkpoints to our flax param trees.

The reference ships `.pth` checkpoints (README.md:63) whose state dict
follows the torch module tree of models/bdetr.py. This module maps those
tensors onto our `{params, batch_stats}` pytrees so released weights can be
evaluated for accuracy parity.

Layout conventions translated:
  * torch Linear weight (out, in)            -> Dense kernel (in, out)
  * torch Conv1d/2d 1x1 weight (out, in, 1..) -> Dense kernel (in, out)
  * torch BatchNorm{weight,bias}             -> BN {scale,bias} (params)
    {running_mean,running_var}               -> BN {mean,var} (batch_stats)
  * torch MultiheadAttention in_proj_weight (3d, d) + out_proj
                                             -> q/k/v/out_proj Dense
  * Embedding weight                         -> Embed embedding / raw table

The mapping is template-driven: we walk OUR param/stat tree and resolve
each leaf path to torch keys, so any unmapped leaf raises loudly with its
path. RoBERTa uses lang.roberta.convert_hf_roberta_state_dict.
"""

import re
from typing import Dict, Tuple

import numpy as np


def _t(x):
    return np.asarray(x)


def flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def unflatten(flat: Dict[Tuple[str, ...], np.ndarray]):
    tree: Dict = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def _mha(sd, torch_prefix, leaf, which):
    """Resolve one q/k/v/out_proj Dense leaf from a torch MHA."""
    d = sd[f"{torch_prefix}.out_proj.weight"].shape[0]
    if which == "out_proj":
        w = _t(sd[f"{torch_prefix}.out_proj.weight"])
        b = _t(sd[f"{torch_prefix}.out_proj.bias"])
    else:
        i = {"q_proj": 0, "k_proj": 1, "v_proj": 2}[which]
        w = _t(sd[f"{torch_prefix}.in_proj_weight"])[i * d:(i + 1) * d]
        b = _t(sd[f"{torch_prefix}.in_proj_bias"])[i * d:(i + 1) * d]
    return w.T if leaf == "kernel" else b


def _linear(sd, key, leaf):
    w = _t(sd[f"{key}.weight"])
    if leaf == "kernel":
        w = w.reshape(w.shape[0], w.shape[1])  # squeeze conv 1x1 trailing
        return w.T
    return _t(sd[f"{key}.bias"])


def _ln(sd, key, leaf):
    return _t(sd[f"{key}.weight" if leaf == "scale" else f"{key}.bias"])


def _bn(sd, key, leaf):
    names = {
        "scale": "weight", "bias": "bias",
        "mean": "running_mean", "var": "running_var",
    }
    return _t(sd[f"{key}.{names[leaf]}"])


def _conv(sd, key, leaf):
    if leaf == "kernel":
        w = _t(sd[f"{key}.weight"])  # (out, in, 1[, 1])
        return w.reshape(w.shape[0], w.shape[1]).T
    return _t(sd[f"{key}.bias"])


_POS_EMBED_IDX = {"Dense_0": "0", "BatchNorm_0": "1", "Dense_1": "3"}
_CONTRASTIVE_IDX = {"Dense_0": "0", "Dense_1": "2", "Dense_2": "4"}
# ThreeLayerMLP torch Sequential (modules.py:94-104):
# 0 conv,1 bn,2 relu,3 drop,4 conv,5 bn,6 relu,7 drop,8 conv
_TLM_IDX = {"dense_0": "net.0", "bn_0": "net.1",
            "dense_1": "net.4", "bn_1": "net.5", "dense_out": "net.8"}
_FFN_IDX = {"Dense_0": "0", "Dense_1": "3"}  # Linear,ReLU,Drop,Linear,Drop


def resolve(sd: Dict[str, np.ndarray], path: Tuple[str, ...]):
    """Resolve one flax leaf path to a tensor from the torch state dict."""
    parts = list(path)
    leaf = parts[-1]
    p = parts[:-1]

    def fail():
        raise KeyError(f"no torch mapping for flax path {'/'.join(path)}")

    # --- top-level simple params
    if parts == ["butd_class_embeddings"]:
        return _t(sd["butd_class_embeddings.weight"])
    if p == ["text_projector"]:
        return _linear(sd, "text_projector.0", leaf)
    if p == ["text_projector_ln"]:
        return _ln(sd, "text_projector.1", leaf)
    if p == ["class_embeddings"]:
        return _linear(sd, "class_embeddings", leaf)
    if p == ["decoder_query_proj"]:
        return _conv(sd, "decoder_query_proj", leaf)


    # --- PositionEmbeddingLearned heads (box_embeddings, pos_embed,
    #     decoder self_posembed)
    if p and p[0] in ("box_embeddings", "pos_embed"):
        idx = _POS_EMBED_IDX[p[1]]
        key = f"{p[0]}.position_embedding_head.{idx}"
        return _bn(sd, key, leaf) if "BatchNorm" in p[1] else _conv(
            sd, key, leaf
        )

    # --- backbone
    if p and p[0] == "backbone_net":
        mod = p[1]  # sa1..sa4 | fp1 | fp2
        attr = "mlp_module" if mod.startswith("sa") else "mlp"
        m = re.match(r"(Dense|BatchNorm)_(\d+)", p[3])
        layer = f"backbone_net.{mod}.{attr}.layer{m.group(2)}"
        if m.group(1) == "Dense":
            return _conv(sd, f"{layer}.conv", leaf)
        return _bn(sd, f"{layer}.bn.bn", leaf)

    # --- kps query selection
    if p and p[0] == "points_obj_cls":
        name = p[1]
        if name.endswith("_bn"):
            return _bn(sd, f"points_obj_cls.bn{name[4]}", leaf)
        return _conv(sd, f"points_obj_cls.{name}", leaf)

    # --- contrastive projections
    if p and p[0].startswith("contrastive_align_projection"):
        return _linear(sd, f"{p[0]}.{_CONTRASTIVE_IDX[p[1]]}", leaf)

    # --- prediction heads
    if p and (p[0] == "proposal_head" or p[0].startswith("prediction_head_")):
        torch_head = (
            "proposal_head" if p[0] == "proposal_head"
            else f"prediction_heads.{p[0].split('_')[-1]}"
        )
        sub = _TLM_IDX[p[2]]
        key = f"{torch_head}.{p[1]}.{sub}"
        return _bn(sd, key, leaf) if p[2].startswith("bn") else _conv(
            sd, key, leaf
        )

    # --- cross-modal encoder
    if p and p[0] == "cross_encoder":
        li = p[1].split("_")[-1]
        base = f"cross_encoder.layers.{li}"
        rest = p[2:]
        if rest[0] in ("self_attention_visual", "self_attention_lang"):
            sub = f"{base}.{rest[0]}"
            if rest[1] == "self_attn":
                return _mha(sd, f"{sub}.self_attn", leaf, rest[2])
            return _ln(sd, f"{sub}.norm1", leaf)  # LayerNorm_0
        if rest[0] == "cross_layer":
            sub = f"{base}.cross_layer"
            inner = rest[1]
            if inner in ("cross_lv", "cross_vl", "cross_d"):
                return _mha(sd, f"{sub}.{inner}", leaf, rest[2])
            if inner.startswith("norm"):
                return _ln(sd, f"{sub}.{inner}", leaf)
            if inner.startswith("ffn"):
                return _linear(
                    sd, f"{sub}.{inner}.{_FFN_IDX[rest[2]]}", leaf
                )
        fail()

    # --- decoder layers
    if p and p[0].startswith("decoder_"):
        li = p[0].split("_")[-1]
        base = f"decoder.{li}"
        rest = p[1:]
        if rest[0] == "self_posembed":
            idx = _POS_EMBED_IDX[rest[1]]
            key = f"{base}.self_posembed.position_embedding_head.{idx}"
            return _bn(sd, key, leaf) if "BatchNorm" in rest[1] else _conv(
                sd, key, leaf
            )
        if rest[0] in ("self_attn", "cross_l", "cross_d", "cross_v"):
            return _mha(sd, f"{base}.{rest[0]}", leaf, rest[1])
        if rest[0].startswith("norm"):
            return _ln(sd, f"{base}.{rest[0]}", leaf)
        if rest[0] == "ffn":
            return _linear(sd, f"{base}.ffn.{_FFN_IDX[rest[1]]}", leaf)
        fail()

    fail()


def convert_torch_checkpoint(state_dict, params, batch_stats):
    """Fill our {params, batch_stats} templates from a reference torch
    state dict (keys may carry the DDP 'module.' prefix, README.md:65).
    Raises KeyError naming the first unmappable/missing leaf."""
    sd = {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }
    new_params = {}
    roberta_done = False
    for path, leaf in flatten(params).items():
        if path[0] == "text_encoder":
            continue  # converted as a block below
        t = resolve(sd, path)
        assert t.shape == tuple(leaf.shape), (path, t.shape, leaf.shape)
        new_params[path] = t.astype(np.asarray(leaf).dtype)
    new_stats = {}
    for path, leaf in flatten(batch_stats).items():
        t = resolve(sd, path)
        assert t.shape == tuple(leaf.shape), (path, t.shape, leaf.shape)
        new_stats[path] = t.astype(np.asarray(leaf).dtype)
    out_params = unflatten(new_params)
    if "text_encoder" in params:
        from butd_detr_tpu.lang.roberta import (
            convert_hf_roberta_state_dict,
            roberta_base_config,
        )

        rb_sd = {
            k[len("text_encoder."):]: v
            for k, v in sd.items()
            if k.startswith("text_encoder.")
        }
        n_layers = sum(
            1 for k in params["text_encoder"] if k.startswith("layer_")
        )
        from butd_detr_tpu.lang.roberta import RobertaConfig

        cfg = roberta_base_config()
        if n_layers != cfg.num_hidden_layers:
            import dataclasses

            cfg = dataclasses.replace(cfg, num_hidden_layers=n_layers)
        out_params["text_encoder"] = convert_hf_roberta_state_dict(
            rb_sd, cfg
        )
    return out_params, unflatten(new_stats)
