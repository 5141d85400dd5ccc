#!/usr/bin/env python
"""Generate the 485-class RoBERTa embedding table.

Replaces reference `data/gen_class_embeddings.py`: writes
`class_embeddings3d.npy` (num_classes, 768) used to initialize the
detected-box class stream. Requires RoBERTa weights (HF cache or a
converted msgpack via --params).
"""

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--output", default="data/class_embeddings3d.npy")
    parser.add_argument("--params", default=None,
                        help="flax msgpack of RoBERTa params (optional)")
    parser.add_argument("--num_classes", type=int, default=485)
    args = parser.parse_args()

    import jax

    from butd_detr_tpu.data.scannet_config import scannet_classes
    from butd_detr_tpu.lang import roberta_base_config
    from butd_detr_tpu.lang.class_embeddings import generate_class_embeddings
    from butd_detr_tpu.lang.roberta import RobertaModel
    from butd_detr_tpu.lang.tokenizer import get_tokenizer

    config = roberta_base_config()
    tokenizer = get_tokenizer(max_len=16)
    names = scannet_classes(args.num_classes)

    if args.params:
        from flax import serialization

        model = RobertaModel(config)
        tok = tokenizer(["init"], max_len=4)
        template = model.init(
            jax.random.PRNGKey(0), tok.ids, tok.attention_mask
        )["params"]
        with open(args.params, "rb") as f:
            params = serialization.from_bytes(template, f.read())
    else:
        from butd_detr_tpu.lang.roberta import convert_hf_roberta_state_dict

        try:
            import transformers

            hf = transformers.RobertaModel.from_pretrained("roberta-base")
            params = convert_hf_roberta_state_dict(
                hf.state_dict(), config
            )
        except Exception as e:
            raise SystemExit(
                f"no RoBERTa weights available ({e}); pass --params"
            )

    table = generate_class_embeddings(config, params, tokenizer, names)
    np.save(args.output, table)
    print(f"wrote {args.output} {table.shape}")


if __name__ == "__main__":
    main()
