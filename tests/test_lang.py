"""Language stack tests: tokenizer, JAX RoBERTa (incl. torch parity), spans."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from butd_detr_tpu.lang import (
    RobertaModel,
    SimpleTokenizer,
    SpanPredictor,
    convert_hf_roberta_state_dict,
    scores_to_pred_spans,
    span_bce_loss,
    tiny_roberta_config,
)


def test_simple_tokenizer_roundtrip():
    tok = SimpleTokenizer(vocab_size=512, max_len=16)
    out = tok(["the red chair", "a lamp next to the bed!"])
    assert out.ids.shape == (2, 16)
    assert out.attention_mask.shape == (2, 16)
    # bos + 3 words + eos
    assert out.lengths[0] == 5
    # deterministic
    out2 = tok(["the red chair", "a lamp next to the bed!"])
    np.testing.assert_array_equal(out.ids, out2.ids)
    # char_to_token: "red" starts at char 4 -> token 2 (after bos)
    assert out.char_to_token(0, 4) == 2
    assert out.char_to_token(0, 3) is None  # whitespace


def test_roberta_forward_and_pad_invariance():
    cfg = tiny_roberta_config()
    model = RobertaModel(cfg)
    ids = np.array([[0, 10, 11, 12, 2, 1, 1, 1]], np.int32)
    mask = (ids != 1).astype(np.int32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    out = model.apply(variables, jnp.asarray(ids), jnp.asarray(mask))
    assert out.shape == (1, 8, cfg.hidden_size)

    # changing the content of PAD positions must not change real positions
    ids2 = ids.copy()
    ids2[0, 6] = 99
    out2 = model.apply(variables, jnp.asarray(ids2), jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(out[0, :5]), np.asarray(out2[0, :5]), atol=1e-5
    )


def test_roberta_matches_torch_hf():
    """Convert a randomly-initialized torch HF RobertaModel and check parity."""
    torch = pytest.importorskip("torch")
    from transformers import RobertaConfig as HFConfig
    from transformers import RobertaModel as HFRoberta

    hf_cfg = HFConfig(
        vocab_size=1024, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=130, type_vocab_size=1, pad_token_id=1,
    )
    torch.manual_seed(0)
    hf = HFRoberta(hf_cfg, add_pooling_layer=False).eval()

    cfg = tiny_roberta_config()
    params = convert_hf_roberta_state_dict(hf.state_dict(), cfg)

    ids = np.array(
        [[0, 5, 6, 7, 8, 2, 1, 1], [0, 9, 10, 2, 1, 1, 1, 1]], np.int64
    )
    mask = (ids != 1).astype(np.int64)
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()

    got = np.asarray(
        RobertaModel(cfg).apply(
            {"params": params},
            jnp.asarray(ids.astype(np.int32)),
            jnp.asarray(mask.astype(np.int32)),
        )
    )
    # parity only at non-pad positions (HF computes garbage at pads too,
    # but masked so downstream never sees it)
    m = mask.astype(bool)
    np.testing.assert_allclose(got[m], want[m], rtol=1e-4, atol=1e-4)


def test_span_predictor_and_loss():
    cfg = tiny_roberta_config()
    model = SpanPredictor(cfg)
    ids = jnp.asarray(np.array([[0, 5, 6, 2, 1, 1]], np.int32))
    variables = model.init(jax.random.PRNGKey(0), ids)
    logits = model.apply(variables, ids)
    assert logits.shape == (1, 6)

    pm = jnp.asarray(np.array([[0, 1, 1, 0, 0, 0]], np.float32))
    loss = span_bce_loss(logits, pm)
    assert np.isfinite(float(loss))

    # grads flow through the trunk (trainable RoBERTa, text_cls.py:390-392)
    def f(p):
        return span_bce_loss(model.apply({"params": p}, ids), pm)

    g = jax.grad(f)(variables["params"])
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert total > 0


def test_scores_to_pred_spans():
    scores = np.array([[3.0, -1.0, 2.0], [-5.0, -2.0, -3.0]], np.float32)
    spans = scores_to_pred_spans(scores)
    assert spans.shape == (2, 256)
    np.testing.assert_allclose(spans.sum(1), [1.0, 1.0])
    assert spans[0, 0] == 0.5 and spans[0, 2] == 0.5  # two positives
    assert spans[1, 1] == 1.0  # empty row falls back to argmax


def test_generate_class_embeddings():
    """Mean-pooled class-name embeddings (reference gen_class_embeddings)."""
    import jax
    import numpy as np

    from butd_detr_tpu.lang import tiny_roberta_config
    from butd_detr_tpu.lang.class_embeddings import (
        generate_class_embeddings,
        load_class_embeddings_into_params,
    )
    from butd_detr_tpu.lang.roberta import RobertaModel
    from butd_detr_tpu.lang.tokenizer import SimpleTokenizer

    config = tiny_roberta_config()
    tok = SimpleTokenizer(vocab_size=config.vocab_size, max_len=8)
    model = RobertaModel(config)
    enc = tok(["chair"], max_len=8)
    params = model.init(
        jax.random.PRNGKey(0), enc.ids, enc.attention_mask
    )["params"]
    names = ["chair", "table", "shower curtain"]
    table = generate_class_embeddings(
        config, params, tok, names, max_len=8, batch_size=2
    )
    assert table.shape == (3, config.hidden_size)
    assert np.isfinite(table).all()
    # pooling respects mask: identical names give identical embeddings
    table2 = generate_class_embeddings(
        config, params, tok, ["chair"], max_len=8
    )
    np.testing.assert_allclose(table[0], table2[0], rtol=2e-5, atol=2e-5)

    fake = {"butd_class_embeddings": np.zeros((3, config.hidden_size))}
    out = load_class_embeddings_into_params(fake, table)
    np.testing.assert_allclose(np.asarray(out["butd_class_embeddings"]),
                               table, rtol=1e-6)
