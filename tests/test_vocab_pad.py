"""Vocab padding (config.vocab_pad_multiple) — bit-exact numerics and
sharding coverage.

The Vicuna vocab is 32001 (32000 + [PAD], reference
``models/xinstructblip.py:154``), which no model-axis width divides, so
round 4's partition rules silently replicated lm_head/embed_tokens.
``vocab_pad_multiple=8`` appends zero rows (as HF
``resize_token_embeddings`` does for the [PAD] row itself) and masks the
pad logit columns to finfo.min — argmax/softmax semantics are unchanged
(bit-identical on TPU; matmul-rounding-level on XLA:CPU), and the padded
dims must tile over the mesh's model axis.  Divergence documented in
docs/DIVERGENCES.md.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mraudio_tpu.config import LlamaConfig
from mraudio_tpu.models.llama import LlamaModel


def _tiny_cfg(**kw):
    return LlamaConfig(
        vocab_size=261, hidden_size=32, num_layers=2, num_heads=4,
        num_kv_heads=4, intermediate_size=64, max_seq_len=64, **kw,
    )


def _pad_params(p, cfg_padded):
    p = jax.device_get(p)
    extra = cfg_padded.padded_vocab_size - cfg_padded.vocab_size
    p["params"]["embed_tokens"]["embedding"] = np.pad(
        p["params"]["embed_tokens"]["embedding"], ((0, extra), (0, 0))
    )
    p["params"]["lm_head"]["kernel"] = np.pad(
        p["params"]["lm_head"]["kernel"], ((0, 0), (0, extra))
    )
    return p


def test_padded_vocab_size_property():
    assert _tiny_cfg().padded_vocab_size == 261
    assert _tiny_cfg(vocab_pad_multiple=8).padded_vocab_size == 264
    assert LlamaConfig(vocab_pad_multiple=8).padded_vocab_size == 32008
    # already-aligned vocab is a no-op
    assert LlamaConfig(
        vocab_size=152064, vocab_pad_multiple=8
    ).padded_vocab_size == 152064


def test_padded_logits_bit_exact():
    cfg = _tiny_cfg()
    cfgp = _tiny_cfg(vocab_pad_multiple=8)
    m, mp = LlamaModel(cfg), LlamaModel(cfgp)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 261, (2, 8)), jnp.int32)
    emb = jnp.asarray(rng.normal(size=(2, 8, 32)).astype(np.float32))
    mask = jnp.tril(jnp.ones((8, 8), bool))[None, None]
    pos = jnp.tile(jnp.arange(8)[None], (2, 1))

    p = m.init(jax.random.PRNGKey(0), emb, mask, pos,
               method="init_all", input_ids=ids)
    pp = _pad_params(p, cfgp)

    lo, _ = m.apply(p, emb, mask, pos)
    lp, _ = mp.apply(pp, emb, mask, pos)
    assert lp.shape[-1] == 264
    # Mathematically the pad columns cannot touch the valid columns (the
    # kernel pad rows are zero and the mask is a per-column where); on
    # TPU the MXU tiles the vocab dim to 128 lanes so N=261 and N=264
    # compile to the same padded GEMM and the logits are bit-identical
    # (verified on the real chip).  XLA:CPU may re-block the GEMM for
    # the different N, so here we allow matmul-rounding noise only.
    np.testing.assert_allclose(
        np.asarray(lo), np.asarray(lp)[..., :261], rtol=0, atol=2e-6
    )
    assert np.all(np.asarray(lp)[..., 261:] == np.finfo(np.float32).min)
    # downstream consumers: argmax and log_softmax are unchanged
    np.testing.assert_array_equal(np.argmax(lo, -1), np.argmax(lp, -1))
    np.testing.assert_allclose(
        np.asarray(jax.nn.log_softmax(lo, axis=-1)),
        np.asarray(jax.nn.log_softmax(lp, axis=-1))[..., :261],
        rtol=0, atol=2e-6,
    )
    # embedding lookup ignores the pad rows entirely
    np.testing.assert_array_equal(
        np.asarray(m.apply(p, ids, method="embed")),
        np.asarray(mp.apply(pp, ids, method="embed")),
    )


def test_full_config_padded_dims_shard_evenly():
    from mraudio_tpu.config import full_model_config

    cfg = full_model_config().llm
    assert cfg.padded_vocab_size == 32008
    for width in (1, 2, 4, 8):
        assert cfg.padded_vocab_size % width == 0


def test_grammar_tables_padded(monkeypatch):
    """_grammar_arrays widens the DFA tables to the padded logits."""
    from mraudio_tpu.config import tiny_model_config
    from mraudio_tpu.models.xinstructblip import XInstructBLIP

    cfg = tiny_model_config()
    cfg = cfg.replace(
        constrained_decoding=True,
        llm=cfg.llm.replace(vocab_pad_multiple=16),
    )
    model = XInstructBLIP(cfg)
    g = model._grammar_arrays()
    pv = cfg.llm.padded_vocab_size
    assert pv > cfg.llm.vocab_size
    assert g["allowed"].shape[1] == pv
    assert g["next_state"].shape[1] == pv
    assert g["dist_next"].shape[1] == pv
    # pad ids are never admissible and never "closest to done"
    assert not bool(np.asarray(g["allowed"])[:, cfg.llm.vocab_size:].any())
    assert np.all(
        np.asarray(g["dist_next"])[:, cfg.llm.vocab_size:]
        >= np.iinfo(np.int32).max // 2
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_fsdp_and_vocab_shardings_on_mesh():
    from jax.sharding import PartitionSpec as P

    from mraudio_tpu.config import MeshConfig
    from mraudio_tpu.parallel import make_mesh, param_shardings

    mesh = make_mesh(MeshConfig(data=2, model=4), devices=jax.devices()[:8])

    class Leaf:
        def __init__(self, shape):
            self.shape, self.ndim = shape, len(shape)

    params = {
        "llm": {
            "embed_tokens": {"embedding": Leaf((32008, 4096))},
            "lm_head": {"kernel": Leaf((4096, 32008))},
        },
        "vit": {"blocks": {"mlp": {"kernel": Leaf((1408, 6144))}}},
        "beats": {"norm": {"scale": Leaf((768,))}},
        "video_query_tokens": Leaf((1, 32, 768)),
    }
    sh = param_shardings(params, mesh)
    assert sh["llm"]["embed_tokens"]["embedding"].spec == P("model", None)
    assert sh["llm"]["lm_head"]["kernel"].spec == P(None, "model")
    # FSDP: largest evenly-tiling dim of the frozen encoder leaves
    assert sh["vit"]["blocks"]["mlp"]["kernel"].spec == P(None, "data")
    assert sh["beats"]["norm"]["scale"].spec == P("data")
    # fsdp_encoders=False restores full replication for the encoders
    sh_off = param_shardings(params, mesh, fsdp_encoders=False)
    assert sh_off["vit"]["blocks"]["mlp"]["kernel"].spec == P()
