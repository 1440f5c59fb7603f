"""Megatron-style sequence parallelism (``LlamaConfig.seq_shard``).

The flag pins the decoder's residual stream (B, S, D) to
``P(data?, "model", None)`` at block boundaries (``models/llama.py
seq_shard``), so norms / residual adds / saved remat inputs live
seq-sharded over the ``model`` axis between the tensor-parallel
matmuls.  These tests pin:

* numerical equivalence (bit-identical on this mesh) to the unsharded
  layout under the real TP partition rules;
* that the annotation lands (the compiled module reshards: all-gathers
  appear that the base layout does not emit);
* the no-op guards — no ambient mesh, 1-token decode, non-tiling S.

The reference has no counterpart (its only parallelism is DDP,
``utils/trainer.py:69``); this is a TPU scaling lever on top of the
Megatron TP rules in ``parallel/partition.py``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mraudio_tpu.config import LlamaConfig, MeshConfig
from mraudio_tpu.models.llama import LlamaModel, seq_shard
from mraudio_tpu.parallel import batch_sharding, make_mesh, shard_params


def _tiny_cfg(**kw):
    return LlamaConfig(
        vocab_size=260, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=4, intermediate_size=128, max_seq_len=2048,
        dtype="float32", vocab_pad_multiple=4, **kw,
    )


def _inputs(B=2, S=16, D=64):
    key = jax.random.PRNGKey(0)
    emb = jax.random.normal(key, (B, S, D), jnp.float32)
    mask = jnp.tril(jnp.ones((S, S), bool))[None, None]
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    ids = jnp.zeros((B, S), jnp.int32)
    return emb, mask, pos, ids


@pytest.fixture(scope="module")
def base():
    cfg = _tiny_cfg()
    model = LlamaModel(cfg, None)
    emb, mask, pos, ids = _inputs()
    params = model.init(jax.random.PRNGKey(1), emb, mask, pos, ids,
                        method=model.init_all)
    return cfg, params, (emb, mask, pos)


def test_seq_shard_matches_unsharded_under_tp(base):
    cfg, params, (emb, mask, pos) = base
    m0 = LlamaModel(cfg, None)
    m1 = LlamaModel(cfg.replace(seq_shard=True), None)
    mesh = make_mesh(MeshConfig(data=2, model=4))
    with jax.set_mesh(mesh):
        placed = {"params": shard_params({"llm": params["params"]}, mesh)["llm"]}
        be = jax.device_put(emb, batch_sharding(mesh))
        f0 = jax.jit(lambda p, e: m0.apply(p, e, mask, pos)[0])
        f1 = jax.jit(lambda p, e: m1.apply(p, e, mask, pos)[0])
        o0 = np.asarray(f0(placed, be))
        o1 = np.asarray(f1(placed, be))
    np.testing.assert_allclose(o0, o1, rtol=2e-5, atol=2e-5)
    # and the layout actually changed: the SP module reshards the
    # residual stream (all-gathers at the TP matmul boundaries) where
    # the base layout has none
    with jax.set_mesh(mesh):
        sp_txt = f1.lower(placed, be).compile().as_text()
        base_txt = f0.lower(placed, be).compile().as_text()
    assert sp_txt.count("all-gather") > base_txt.count("all-gather")


def test_seq_shard_grads_match(base):
    cfg, params, (emb, mask, pos) = base
    m0 = LlamaModel(cfg, None)
    m1 = LlamaModel(cfg.replace(seq_shard=True), None)
    mesh = make_mesh(MeshConfig(data=2, model=4))

    def loss(m):
        def f(p, e):
            out = m.apply(p, e, mask, pos)[0]
            return jnp.mean(out.astype(jnp.float32) ** 2)
        return f

    with jax.set_mesh(mesh):
        placed = {"params": shard_params({"llm": params["params"]}, mesh)["llm"]}
        be = jax.device_put(emb, batch_sharding(mesh))
        g0 = jax.jit(jax.grad(loss(m0)))(placed, be)
        g1 = jax.jit(jax.grad(loss(m1)))(placed, be)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5)


def test_seq_shard_noop_without_mesh():
    cfg = _tiny_cfg(seq_shard=True)
    x = jnp.ones((2, 16, 64))
    assert seq_shard(x, cfg) is x  # no ambient mesh: identity


def test_seq_shard_noop_guards():
    cfg = _tiny_cfg(seq_shard=True)
    mesh = make_mesh(MeshConfig(data=2, model=4))
    with jax.set_mesh(mesh):
        one_tok = jnp.ones((2, 1, 64))
        assert seq_shard(one_tok, cfg) is one_tok  # decode step
        short = jnp.ones((2, 6, 64))
        assert seq_shard(short, cfg) is short  # S < 2*model: not worth it
        off = seq_shard(jnp.ones((2, 16, 64)), _tiny_cfg())
        assert off.sharding.is_fully_replicated  # flag off: untouched
        # uneven S shards too, but only under jit (GSPMD pads the last
        # shard; the eager device_put path can't) — QVH's 5,353
        # interleave divides by nothing
        ragged = jax.jit(lambda x: seq_shard(x, cfg))(jnp.ones((2, 16, 64))[:, :15])
        assert not ragged.sharding.is_fully_replicated
        # odd batch that doesn't tile the data axis: skip SP rather
        # than force batch replication
        odd_b = jnp.ones((3, 16, 64))
        assert seq_shard(odd_b, cfg) is odd_b


def test_seq_shard_uneven_matches(base):
    """S=15 over a 4-wide model axis: GSPMD's padded sharding must not
    change the forward."""
    cfg, params, _ = base
    emb, mask, pos, _ = _inputs(S=15)
    m0 = LlamaModel(cfg, None)
    m1 = LlamaModel(cfg.replace(seq_shard=True), None)
    mesh = make_mesh(MeshConfig(data=2, model=4))
    with jax.set_mesh(mesh):
        placed = {"params": shard_params({"llm": params["params"]}, mesh)["llm"]}
        be = jax.device_put(emb, batch_sharding(mesh))
        o0 = np.asarray(jax.jit(lambda p, e: m0.apply(p, e, mask, pos)[0])(placed, be))
        o1 = np.asarray(jax.jit(lambda p, e: m1.apply(p, e, mask, pos)[0])(placed, be))
    np.testing.assert_allclose(o0, o1, rtol=2e-5, atol=2e-5)


def test_seq_shard_generate_tokens_identical(base):
    """End-to-end: prefill+decode through the cache produce the same
    argmax tokens with and without SP (decode steps are S=1 no-ops;
    prefill is where the annotation bites)."""
    cfg, params, (emb, mask, pos) = base
    mesh = make_mesh(MeshConfig(data=2, model=4))

    def greedy(m, p, e):
        logits, _ = m.apply(p, e, mask, pos)
        return jnp.argmax(logits[:, -1], axis=-1)

    m0 = LlamaModel(cfg, None)
    m1 = LlamaModel(cfg.replace(seq_shard=True), None)
    with jax.set_mesh(mesh):
        placed = {"params": shard_params({"llm": params["params"]}, mesh)["llm"]}
        be = jax.device_put(emb, batch_sharding(mesh))
        t0 = np.asarray(jax.jit(lambda p, e: greedy(m0, p, e))(placed, be))
        t1 = np.asarray(jax.jit(lambda p, e: greedy(m1, p, e))(placed, be))
    np.testing.assert_array_equal(t0, t1)
