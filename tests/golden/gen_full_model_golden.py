#!/usr/bin/env python
"""Generate FULL-MODEL golden fixtures by running the reference BeaUTyDETR
end-to-end on CPU (CUDA extension stubbed with our oracle-tested ops — see
ref_torch_stub.py), with random weights, random BN running stats, eval
mode, and a deterministic fake tokenizer + random-init frozen Roberta.

Saves the complete torch state_dict, the exact inputs (including the
tokenized ids our pipeline-side model consumes), and every tensor in
end_points. tests/test_full_model_golden.py converts the state_dict with
train/torch_convert and requires our model to reproduce the outputs —
whole-model wiring parity, backbone through heads.

Usage: python tests/golden/gen_full_model_golden.py
"""

import os.path as osp
import sys
import tempfile

import numpy as np
import torch

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, "/root/repo")

OUT = osp.join(osp.dirname(osp.abspath(__file__)), "full_model_golden.npz")

B, N, NQ, NDET = 2, 2048, 64, 16
ROBERTA = dict(
    vocab_size=1024, hidden_size=96, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=128,
    max_position_embeddings=80, type_vocab_size=1,
    pad_token_id=1, bos_token_id=0, eos_token_id=2,
)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from ref_torch_stub import load_reference_model

    work = tempfile.mkdtemp(prefix="refgold_")
    model, tok, ns = load_reference_model(
        workdir=work, roberta_config=ROBERTA,
        num_class=256, num_obj_class=485, input_feature_dim=3,
        num_queries=NQ, num_decoder_layers=6,
        self_position_embedding="loc_learned",
        contrastive_align_loss=True, butd=True, self_attend=True,
    )
    model.eval()

    rng = np.random.RandomState(0)
    # randomize BN running stats so eval-BN wiring is exercised
    with torch.no_grad():
        for name, b in model.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.as_tensor(
                    rng.normal(0, 0.3, b.shape).astype(np.float32)))
            elif name.endswith("running_var"):
                b.copy_(torch.as_tensor(
                    rng.uniform(0.5, 2.0, b.shape).astype(np.float32)))

    pc = (rng.rand(B, N, 6) * 3 + 1).astype(np.float32)
    texts = ["the red chair near the window",
             "a small wooden table beside the bed"]
    det_boxes = (rng.rand(B, NDET, 6).astype(np.float32) * 2 + 0.5)
    det_mask = np.ones((B, NDET), bool)
    det_mask[1, 10:] = False
    det_ids = rng.randint(0, 485, (B, NDET)).astype(np.int64)

    inputs = {
        "point_clouds": torch.as_tensor(pc),
        "text": texts,
        "det_boxes": torch.as_tensor(det_boxes),
        "det_bbox_label_mask": torch.as_tensor(det_mask),
        "det_class_ids": torch.as_tensor(det_ids),
    }
    with torch.no_grad():
        ep = model(inputs)

    enc = tok.batch_encode_plus(texts)
    data = {
        "in.point_clouds": pc,
        "in.det_boxes": det_boxes,
        "in.det_bbox_label_mask": det_mask,
        "in.det_class_ids": det_ids.astype(np.int32),
        "in.text_ids": enc.input_ids.numpy().astype(np.int32),
        "in.text_mask": enc.attention_mask.numpy().astype(np.int32),
    }
    for k, v in model.state_dict().items():
        data[f"sd.{k}"] = v.detach().numpy()
    for k, v in ep.items():
        if isinstance(v, torch.Tensor):
            data[f"out.{k}"] = v.detach().numpy()

    np.savez_compressed(OUT, **data)
    print(f"wrote {OUT}: {len(data)} arrays, "
          f"{sum(1 for k in data if k.startswith('out.'))} end_points")


if __name__ == "__main__":
    main()
