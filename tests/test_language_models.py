"""LanguageEncoder (BERT->LSTM) and the non-CMA high-level variant."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_policies import tiny_model_config, tiny_obs


def test_language_encoder_modes(rng):
    from robo_vln_tpu.models.encoders.language import LanguageEncoder

    mc = tiny_model_config()
    ids = jnp.asarray(rng.integers(1, 100, (2, 9)), jnp.int32).at[1, 5:].set(0)

    enc = LanguageEncoder(bert_config=mc.BERT, hidden_size=12,
                          final_state_only=True)
    v = enc.init(jax.random.PRNGKey(0), ids)
    final = enc.apply(v, ids)
    assert final.shape == (2, 12)

    enc2 = LanguageEncoder(bert_config=mc.BERT, hidden_size=12,
                           final_state_only=False)
    v2 = enc2.init(jax.random.PRNGKey(0), ids)
    outs, (h_t, c_t) = enc2.apply(v2, ids)
    assert outs.shape == (2, 9, 12)
    assert h_t.shape == (2, 12)
    # encoder2decoder is a tanh projection of the final state
    assert np.abs(np.asarray(h_t)).max() <= 1.0
    # BERT frozen: no grads reach embedding_layer
    def loss(p):
        f = enc.apply(p, ids)
        return jnp.sum(f**2)

    g = jax.grad(loss)(v)["params"]
    bert_g = jax.tree.reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), g["embedding_layer"], 0.0
    )
    assert bert_g == 0.0


def test_seq2seq_bert_language_path(rng):
    """Seq2SeqPolicy with is_bert=True routes through LanguageEncoder."""
    from robo_vln_tpu.models.seq2seq import Seq2SeqPolicy

    mc = tiny_model_config()
    mc.DEPTH_ENCODER.cnn_type = "SimpleDepthCNN"
    mc.RGB_ENCODER.cnn_type = "SimpleRGBCNN"
    mc.INSTRUCTION_ENCODER.is_bert = True
    policy = Seq2SeqPolicy(model_config=mc)
    t, b = 2, 2
    obs = tiny_obs(rng, t, b)
    masks = jnp.ones((b, t))
    hidden = policy.initial_hidden(b)
    params = jax.jit(policy.init)(jax.random.PRNGKey(0), obs, hidden, None, masks)
    assert "embedding_layer" in params["params"]["instruction_encoder"]
    actions, stop, hid, _ = policy.apply(params, obs, hidden, None, masks)
    assert actions.shape == (b, t, 2)


def test_high_level_seq2seq_variant(rng):
    from robo_vln_tpu.models.hierarchical_seq2seq import HighLevelSeq2SeqPolicy

    mc = tiny_model_config()
    policy = HighLevelSeq2SeqPolicy(model_config=mc)
    t, b = 2, 2
    obs = tiny_obs(rng, t, b)
    masks = jnp.ones((b, t)).at[:, 0].set(0.0)
    hidden = policy.initial_hidden(b)
    params = jax.jit(policy.init)(jax.random.PRNGKey(0), obs, hidden, None, masks)
    logits, hid = policy.apply(params, obs, hidden, None, masks)
    assert logits.shape == (b, t, 4)
    # single-step mode
    obs1 = {k: (v[:, 0] if k != "instruction" else v) for k, v in obs.items()}
    l1, _ = policy.apply(params, obs1, hidden, None, jnp.zeros((b,)))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(logits[:, 0]), atol=1e-5)
