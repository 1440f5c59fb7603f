"""End-to-end assembly tests on the tiny config (CPU, random weights)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mraudio_tpu.config import tiny_data_config, tiny_model_config
from mraudio_tpu.data.dataset import MRDataset, collate
from mraudio_tpu.models.xinstructblip import XInstructBLIP


def _make_batch(tmp_path, n=2, n_frms=4):
    import json

    path = str(tmp_path / "ann.jsonl")
    with open(path, "w") as f:
        for i in range(n):
            f.write(
                json.dumps(
                    {
                        "vid": f"vid{i}",
                        "qid": i,
                        "query": f"person does thing {i}",
                        "duration": 150,
                        "relevant_windows": [[10, 30]],
                    }
                )
                + "\n"
            )
    cfg = tiny_data_config(n_frms=n_frms)
    ds = MRDataset(cfg, annotation_path=path)
    return cfg, collate([ds.get(i) for i in range(n)], n)


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_model_config()
    model = XInstructBLIP(cfg, audio_cfg=tiny_data_config().audio)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def test_generate_returns_strings(tmp_path, model_and_params):
    model, params = model_and_params
    _, batch = _make_batch(tmp_path)
    out = model.generate(params, batch)
    assert isinstance(out, list) and len(out) == 2
    assert all(isinstance(o, str) for o in out)


def test_generate_deterministic(tmp_path, model_and_params):
    model, params = model_and_params
    _, batch = _make_batch(tmp_path)
    assert model.generate(params, batch) == model.generate(params, batch)


def test_loss_finite_and_video_sensitive(tmp_path, model_and_params):
    model, params = model_and_params
    _, batch = _make_batch(tmp_path)
    loss = model.loss(params, batch)
    assert np.isfinite(float(loss))

    # different video content must change the loss (the visual path is live)
    batch2 = batch
    batch2.video = 255 - batch.video
    loss2 = model.loss(params, batch2)
    assert float(loss) != float(loss2)


def test_loss_grad_flows_to_lora_and_qformer(tmp_path, model_and_params):
    model, params = model_and_params
    _, batch = _make_batch(tmp_path)

    text = model.prepare_text(
        batch.text_input, np.asarray(batch.timestamps), batch.duration,
        text_output=batch.text_output,
    )
    args = (
        jnp.asarray(batch.video), jnp.asarray(batch.audio),
        jnp.asarray(text.qformer_ids), jnp.asarray(text.qformer_mask),
        jnp.asarray(text.ts_ids), jnp.asarray(text.ts_mask),
        jnp.asarray(text.dur_ids), jnp.asarray(text.dur_mask),
        jnp.asarray(text.concat_ids), jnp.asarray(text.concat_mask),
        jnp.asarray(text.labels),
    )
    grads = jax.grad(lambda p: model._loss_fn(p, *args, n_frms=4))(params)

    def total_norm(tree):
        return sum(
            float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(tree)
        )

    lora_grads = [
        g for path, g in jax.tree_util.tree_leaves_with_path(grads["llm"])
        if any("lora" in str(p) for p in path)
    ]
    assert sum(float(jnp.sum(jnp.abs(g))) for g in lora_grads) > 0
    assert total_norm(grads["video_qformer"]) > 0
    assert total_norm(grads["audio_qformer"]) > 0
    assert total_norm(grads["video_proj"]) > 0


def test_video_only_modality(tmp_path):
    cfg = tiny_model_config(modalities=("video",))
    model = XInstructBLIP(cfg, audio_cfg=tiny_data_config().audio)
    params = model.init_params(jax.random.PRNGKey(0))
    _, batch = _make_batch(tmp_path)
    out = model.generate(params, batch)
    assert len(out) == 2
    loss = model.loss(params, batch)
    assert np.isfinite(float(loss))


def test_prepare_text_shapes(model_and_params):
    model, _ = model_and_params
    cfg = model.cfg
    ts = np.array([[0, 3, 6, 9], [0, 2, 4, 6]])
    tb = model.prepare_text(["q one", "q two"], ts, [150, 60])
    assert tb.ts_ids.shape == (2, 4, cfg.tokens_per_timestamp)
    assert tb.prompt_ids.shape == (2, cfg.max_txt_len)
    # left padding for generate
    assert tb.prompt_mask[0, 0] == 0 and tb.prompt_mask[0, -1] == 1

    tb2 = model.prepare_text(["q"], ts[:1], [9], text_output=["[[10, 20]]"])
    assert tb2.concat_ids.shape == (1, cfg.max_txt_len + cfg.max_output_txt_len)
    # labels: -100 on prompt part, real ids on output part, eos terminated
    valid = tb2.labels[0] != -100
    assert valid.sum() > 0
    last_valid = np.where(valid)[0][-1]
    assert tb2.concat_ids[0, last_valid] == model.llm_tokenizer.eos_token_id


def test_interleave_layout_matches_reference_order(model_and_params):
    """The prefix must be, per frame: [\" video: \" cue][Q video tokens]
    [\" audio: \" cue][Q audio tokens][timestamp slots], then duration —
    the reference's interleave order (models/xinstructblip.py:342-385)."""
    import jax.numpy as jnp

    model, params = model_and_params
    cfg = model.cfg
    b, t = 1, 3
    ts = np.array([[0, 2, 4]])
    text = model.prepare_text(["query x"], ts, [30])

    rng = np.random.default_rng(0)
    video = rng.integers(0, 256, (b, t, 28, 28, 3), dtype=np.uint8)
    hop, win = model.audio_cfg.hop_length, model.audio_cfg.win_length
    ns = hop * (t * model.audio_cfg.mel_frames_per_chunk - 1) + win
    audio = rng.uniform(-1, 1, (b, ns)).astype(np.float32)

    embeds, mask = model._prefix_and_prompt(
        params, jnp.asarray(video), jnp.asarray(audio),
        jnp.asarray(text.qformer_ids), jnp.asarray(text.qformer_mask),
        jnp.asarray(text.ts_ids), jnp.asarray(text.ts_mask),
        jnp.asarray(text.dur_ids), jnp.asarray(text.dur_mask),
        jnp.asarray(text.prompt_ids), jnp.asarray(text.prompt_mask),
        n_frms=t,
    )
    q = cfg.qformer.num_query_tokens
    lc_v = len(model.cue_ids["video"])
    lc_a = len(model.cue_ids["audio"])
    frame_block = lc_v + q + lc_a + q + cfg.tokens_per_timestamp
    expected = t * frame_block + cfg.tokens_per_duration + cfg.max_txt_len
    assert embeds.shape[1] == expected

    # the video cue embedding of frame 0 sits at offset 0 and equals the
    # raw embedding lookup of the cue ids; audio cue follows the video
    # tokens; frame 1's block starts exactly one frame_block later
    cue_v = np.asarray(model._embed_ids(params, jnp.asarray(model.cue_ids["video"])[None]))[0]
    cue_a = np.asarray(model._embed_ids(params, jnp.asarray(model.cue_ids["audio"])[None]))[0]
    emb = np.asarray(embeds, np.float32)
    np.testing.assert_allclose(emb[0, :lc_v], cue_v.astype(np.float32), rtol=1e-2, atol=1e-2)
    a_off = lc_v + q
    np.testing.assert_allclose(emb[0, a_off:a_off + lc_a], cue_a.astype(np.float32), rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(
        emb[0, frame_block:frame_block + lc_v], cue_v.astype(np.float32), rtol=1e-2, atol=1e-2
    )
    # timestamp slots carry their per-frame mask
    ts_off = lc_v + q + lc_a + q
    np.testing.assert_array_equal(
        np.asarray(mask)[0, ts_off:ts_off + cfg.tokens_per_timestamp],
        text.ts_mask[0, 0],
    )


def test_chunked_ce_equals_dense(model_and_params):
    """The chunked CE must equal the dense shifted-CE computation."""
    model, params = model_and_params
    rng = np.random.default_rng(0)
    b, s, d = 2, 37, model.cfg.llm.hidden_size  # non-multiple of the chunk
    hidden = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    labels = rng.integers(0, model.cfg.llm.vocab_size, (b, s)).astype(np.int32)
    labels[0, :10] = -100
    labels[1, 20:] = -100
    labels_j = jnp.asarray(labels)

    chunked = float(model._chunked_ce(params, hidden, labels_j, chunk=16))

    logits = model.llm.apply(
        {"params": params["llm"]},
        method=lambda m, x: m.lm_head(x).astype(jnp.float32), x=hidden,
    )
    valid = labels_j != -100
    safe = jnp.where(valid, labels_j, 0)
    lp = jax.nn.log_softmax(logits, axis=-1)
    tok = jnp.take_along_axis(lp, safe[..., None], axis=-1)[..., 0]
    dense = float(-(tok * valid).sum() / jnp.maximum(valid.sum(), 1))
    assert chunked == pytest.approx(dense, rel=1e-5)


def test_prefix_mask_host_matches_device():
    """The serving encode path derives the prefix mask host-side
    (no sync on the encode dispatch); it must equal the device mask
    from _prefix_and_prompt bit for bit, including padded timestamp
    slots and left-padded prompts of uneven length."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mraudio_tpu.config import tiny_data_config, tiny_model_config
    from mraudio_tpu.data.dataset import MRDataset, collate
    from mraudio_tpu.models.xinstructblip import XInstructBLIP

    data_cfg = tiny_data_config(n_frms=3)
    model = XInstructBLIP(tiny_model_config(), audio_cfg=data_cfg.audio)
    params = model.init_params(jax.random.PRNGKey(0))
    anns = [
        {"vid": "a", "qid": 0, "query": "short", "duration": 90,
         "relevant_windows": [[1, 5]]},
        {"vid": "b", "qid": 1, "query": "a much longer query string here",
         "duration": 1507, "relevant_windows": [[2, 9]]},
    ]
    ds = MRDataset(data_cfg, annotations=anns)
    batch = collate([ds.get(i) for i in range(2)], 2)
    text = model.prepare_text(
        batch.text_input, np.asarray(batch.timestamps), batch.duration
    )
    _, dev_mask = model._prefix_and_prompt(
        params,
        jnp.asarray(model._wire_video(batch.video)), jnp.asarray(batch.audio),
        jnp.asarray(text.qformer_ids), jnp.asarray(text.qformer_mask),
        jnp.asarray(text.ts_ids), jnp.asarray(text.ts_mask),
        jnp.asarray(text.dur_ids), jnp.asarray(text.dur_mask),
        jnp.asarray(text.prompt_ids), jnp.asarray(text.prompt_mask),
        n_frms=3,
    )
    host = model.prefix_mask_host(text, 3)
    np.testing.assert_array_equal(np.asarray(dev_mask), host)
