"""Independent torch oracle for the interleave assembly + label masking.

The highest-stakes parity seam is the cue/query-token/timestamp
interleave and the three-stage label masking: a one-token displacement
would pass every component test and destroy real-weight parity.  This
module re-derives the REFERENCE's embedding assembly from its source —
NOT from ``mraudio_tpu`` — as a standalone torch fixture at tiny width:

* generate-side prefix build: ``/root/reference/models/xinstructblip.py:
  309-385`` (left padding at ``:223``, stripped prompt ``:310``, cue
  tokenization with default specials ``:215``, per-frame
  ``[cue_v, Q_v, cue_a, Q_a, " t "]`` then ``"dur "`` then prompt);
* train-side splice + targets: ``:481-594`` — right padding / left input
  truncation ``:481-491``, output tokenized WITH bos then truncated to
  ``max_output_txt_len`` then bos-stripped ``:494-507``,
  ``concat_text_input_output`` ``:26-48``, pad→-100 and first-l→-100
  masking ``:510-516``, all-(-100) prefix targets ``:583-594``.

Both sides consume the same byte tokenizer and the same (bf16-exact)
embedding table, with fabricated per-frame Q-Former outputs, and are
compared ELEMENTWISE on the valid-position subsequence — the sequence
the LLM actually attends (positions are mask-cumsum on both sides, so
padding layout differences are immaterial by construction while any
cue/timestamp/mask-boundary displacement shifts the subsequence and
fails the comparison).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from mraudio_tpu.config import tiny_data_config, tiny_model_config
from mraudio_tpu.models.xinstructblip import XInstructBLIP
from mraudio_tpu.text.tokenizer import ByteTokenizer

# ---------------------------------------------------------------------------
# Reference re-derivation (torch, written from the reference source)
# ---------------------------------------------------------------------------


def _tokenize_longest(tok, texts, add_special, max_length=None,
                      trunc_side="right", pad_side="right"):
    """HF ``tokenizer(..., padding='longest')`` semantics in plain torch:
    per-text encode, optional truncation, pad to the batch's longest."""
    seqs = [tok.encode(t, add_special_tokens=add_special) for t in texts]
    if max_length is not None:
        seqs = [s[-max_length:] if trunc_side == "left" else s[:max_length]
                for s in seqs]
    L = max(len(s) for s in seqs)
    ids = torch.full((len(seqs), L), tok.pad_token_id, dtype=torch.long)
    att = torch.zeros((len(seqs), L), dtype=torch.long)
    for i, s in enumerate(seqs):
        if pad_side == "left":
            ids[i, L - len(s):] = torch.tensor(s, dtype=torch.long)
            att[i, L - len(s):] = 1
        else:
            ids[i, : len(s)] = torch.tensor(s, dtype=torch.long)
            att[i, : len(s)] = 1
    return ids, att


def _ref_frame_blocks(tok, E, inputs_llm, timestamps, durations, num_query):
    """The shared per-frame interleave + duration blocks
    (reference ``:342-377`` generate / ``:544-579`` train — identical)."""
    B, T = len(timestamps), len(timestamps[0])
    emb = lambda ids: E[ids]  # noqa: E731

    att_list, inp_list = [], []
    cue = {}
    for m, s in (("video", " video: "), ("audio", " audio: ")):
        # reference cue tokenization uses the tokenizer DEFAULT
        # add_special_tokens=True (:215) — every cue starts with the
        # remapped bos
        ids = tok.encode(s, add_special_tokens=True)
        cue[m] = (torch.tensor([ids], dtype=torch.long),
                  torch.ones((1, len(ids)), dtype=torch.long))

    flat_ts = [f" {t} " for row in timestamps for t in row]
    ts_ids, ts_att = _tokenize_longest(tok, flat_ts, add_special=False)
    ts_emb = emb(ts_ids).view(B, T, ts_ids.shape[1], -1)
    ts_att = ts_att.view(B, T, -1)

    for pos in range(T):
        for m in ("video", "audio"):
            cue_ids, cue_att = cue[m]
            att_list += [cue_att.repeat(B, 1),
                         torch.ones((B, num_query), dtype=torch.long)]
            inp_list += [emb(cue_ids).repeat(B, 1, 1), inputs_llm[m][:, pos]]
        inp_list.append(ts_emb[:, pos])
        att_list.append(ts_att[:, pos])

    dur_ids, dur_att = _tokenize_longest(
        tok, [f"{d} " for d in durations], add_special=False)
    att_list.append(dur_att)
    inp_list.append(emb(dur_ids))
    return inp_list, att_list


def reference_generate_assembly(tok, E, inputs_llm, prompts, timestamps,
                                durations, num_query):
    """(inputs_embeds, attention_mask) of reference ``generate``."""
    inp_list, att_list = _ref_frame_blocks(
        tok, E, inputs_llm, timestamps, durations, num_query)
    # :223 left padding; :310 strip; :312-317 no special tokens
    pr_ids, pr_att = _tokenize_longest(
        tok, [p.strip() for p in prompts], add_special=False, pad_side="left")
    att_list.append(pr_att)
    inp_list.append(E[pr_ids])
    return torch.cat(inp_list, dim=1), torch.cat(att_list, dim=1)


def reference_train_assembly(tok, E, inputs_llm, text_input, text_output,
                             timestamps, durations, num_query,
                             max_txt_len, max_output_txt_len):
    """(inputs_embeds, attention_mask, targets) of reference ``forward``."""
    inp_list, att_list = _ref_frame_blocks(
        tok, E, inputs_llm, timestamps, durations, num_query)

    # :481-491 input: right padding, LEFT truncation, with bos
    in_ids, in_att = _tokenize_longest(
        tok, text_input, add_special=True, max_length=max_txt_len,
        trunc_side="left")
    # :493-500 output: "t + eos_token" tokenized with default specials
    # (LlamaTokenizer: bos prepended, the appended "</s>" text maps to
    # the eos id), RIGHT truncation to max_output_txt_len — bos inside
    # the budget, stripped below
    out_seqs = [[tok.bos_token_id]
                + tok.encode(t, add_special_tokens=False)
                + [tok.eos_token_id]
                for t in text_output]
    out_seqs = [s[:max_output_txt_len] for s in out_seqs]
    Lo = max(len(s) for s in out_seqs)
    out_ids = torch.full((len(out_seqs), Lo), tok.pad_token_id,
                         dtype=torch.long)
    out_att = torch.zeros((len(out_seqs), Lo), dtype=torch.long)
    for i, s in enumerate(out_seqs):
        out_ids[i, : len(s)] = torch.tensor(s, dtype=torch.long)
        out_att[i, : len(s)] = 1

    # concat_text_input_output (:26-48): [input_valid, output[1:], input_pad]
    rows_ids, rows_att, input_part_len = [], [], []
    for i in range(in_ids.shape[0]):
        ones = int(in_att[i].sum())
        input_part_len.append(ones)
        rows_ids.append(torch.cat(
            [in_ids[i][:ones], out_ids[i][1:], in_ids[i][ones:]]))
        rows_att.append(torch.cat(
            [in_att[i][:ones], out_att[i][1:], in_att[i][ones:]]))
    llm_ids = torch.stack(rows_ids)
    llm_att = torch.stack(rows_att)

    # :510-516 targets: pad→-100, input part→-100
    targets = llm_ids.masked_fill(llm_ids == tok.pad_token_id, -100)
    for i, l in enumerate(input_part_len):
        targets[i][:l] = -100

    # :583-594 prefix targets all -100
    prefix_att = torch.cat(att_list, dim=1)
    empty_targets = torch.full(prefix_att.shape, -100, dtype=torch.long)

    inputs_embeds = torch.cat(inp_list + [E[llm_ids]], dim=1)
    attention_mask = torch.cat([prefix_att, llm_att], dim=1)
    full_targets = torch.cat([empty_targets, targets], dim=1)
    return inputs_embeds, attention_mask, full_targets


# ---------------------------------------------------------------------------
# Shared inputs + the mraudio_tpu side
# ---------------------------------------------------------------------------

B, T = 2, 3

# Prompts stay inside max_txt_len: the reference's generate never
# truncates the prompt; ours clips to the static budget (documented
# static-shape divergence) — the oracle pins the live-equal path.
TEXT_INPUT = [
    "Find the person waving.",
    "When does the red car go?",
]
TEXT_OUTPUT = [
    "[[5, 23]]",
    # long enough to hit the output budget -> exercises the
    # truncate-then-strip-bos edge
    "[[0, 7], [12, 19], [40, 57]]",
]
# uneven digit counts across frames and rows
TIMESTAMPS = np.array([[0, 7, 1500], [3, 48, 149]], np.int32)
DURATIONS = [150, 1507]


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_model_config()
    cfg = cfg.replace(max_txt_len=32, max_output_txt_len=12)
    data_cfg = tiny_data_config(n_frms=T)
    model = XInstructBLIP(cfg, audio_cfg=data_cfg.audio)
    tok = model.llm_tokenizer
    assert isinstance(tok, ByteTokenizer)
    q = cfg.qformer.num_query_tokens
    D = cfg.llm.hidden_size

    rng = np.random.default_rng(0)
    # bf16-exact values: both sides compare elementwise in fp32
    table = np.asarray(
        jnp.asarray(rng.standard_normal((cfg.llm.vocab_size, D)),
                    jnp.bfloat16).astype(jnp.float32))
    modal_np = {
        m: np.asarray(
            jnp.asarray(rng.standard_normal((B, T, q, D)),
                        jnp.bfloat16).astype(jnp.float32))
        for m in ("video", "audio")
    }
    params = {"llm": {"embed_tokens": {"embedding": jnp.asarray(table)}}}
    E = torch.from_numpy(table.copy())
    modal_pt = {m: torch.from_numpy(v.copy()) for m, v in modal_np.items()}
    return cfg, model, tok, q, table, params, modal_np, modal_pt, E


def _valid_rows(arr, mask):
    """Per-row subsequence at mask==1 positions (the attended sequence)."""
    arr, mask = np.asarray(arr, np.float32), np.asarray(mask)
    return [arr[i][mask[i] > 0] for i in range(arr.shape[0])]


def test_generate_prefix_matches_reference(setup):
    cfg, model, tok, q, table, params, modal_np, modal_pt, E = setup

    ref_emb, ref_att = reference_generate_assembly(
        tok, E, modal_pt, TEXT_INPUT, TIMESTAMPS.tolist(), DURATIONS, q)

    text = model.prepare_text(TEXT_INPUT, TIMESTAMPS, DURATIONS)
    modal = {m: jnp.asarray(v) for m, v in modal_np.items()}
    prefix, pmask = model._build_prefix(
        params, modal, jnp.asarray(text.ts_ids), jnp.asarray(text.ts_mask),
        jnp.asarray(text.dur_ids), jnp.asarray(text.dur_mask))
    prompt_emb = model._embed_ids(params, jnp.asarray(text.prompt_ids))
    ours_emb = jnp.concatenate([prefix, prompt_emb], axis=1)
    ours_mask = np.concatenate([np.asarray(pmask), text.prompt_mask], axis=1)

    ref_rows = _valid_rows(ref_emb.numpy(), ref_att.numpy())
    our_rows = _valid_rows(ours_emb, ours_mask)
    for i, (r, o) in enumerate(zip(ref_rows, our_rows)):
        assert r.shape == o.shape, (
            f"row {i}: valid length {o.shape[0]} != reference {r.shape[0]}")
        np.testing.assert_array_equal(r, o, err_msg=f"row {i} embeds")


def test_train_assembly_and_labels_match_reference(setup):
    cfg, model, tok, q, table, params, modal_np, modal_pt, E = setup

    ref_emb, ref_att, ref_targets = reference_train_assembly(
        tok, E, modal_pt, TEXT_INPUT, TEXT_OUTPUT, TIMESTAMPS.tolist(),
        DURATIONS, q, cfg.max_txt_len, cfg.max_output_txt_len)

    text = model.prepare_text(TEXT_INPUT, TIMESTAMPS, DURATIONS,
                              text_output=TEXT_OUTPUT)
    modal = {m: jnp.asarray(v) for m, v in modal_np.items()}
    prefix, pmask = model._build_prefix(
        params, modal, jnp.asarray(text.ts_ids), jnp.asarray(text.ts_mask),
        jnp.asarray(text.dur_ids), jnp.asarray(text.dur_mask))
    text_emb = model._embed_ids(params, jnp.asarray(text.concat_ids))
    ours_emb = jnp.concatenate([prefix, text_emb], axis=1)
    ours_mask = np.concatenate([np.asarray(pmask), text.concat_mask], axis=1)
    # prefix labels are all -100 (_loss_from_tokens:739-741)
    ours_labels = np.concatenate(
        [np.full(np.asarray(pmask).shape, -100, np.int32), text.labels],
        axis=1)

    # sanity: the long output really hits the budget (the edge under test)
    long_out = tok.encode(TEXT_OUTPUT[1], add_special_tokens=False)
    assert len(long_out) + 1 > cfg.max_output_txt_len

    ref_emb_rows = _valid_rows(ref_emb.numpy(), ref_att.numpy())
    our_emb_rows = _valid_rows(ours_emb, ours_mask)
    ref_lab_rows = _valid_rows(ref_targets.numpy(), ref_att.numpy())
    our_lab_rows = _valid_rows(ours_labels, ours_mask)
    for i in range(B):
        assert ref_emb_rows[i].shape == our_emb_rows[i].shape, (
            f"row {i}: valid length {our_emb_rows[i].shape[0]} != "
            f"reference {ref_emb_rows[i].shape[0]}")
        np.testing.assert_array_equal(
            ref_emb_rows[i], our_emb_rows[i], err_msg=f"row {i} embeds")
        np.testing.assert_array_equal(
            ref_lab_rows[i].astype(np.int32),
            our_lab_rows[i].astype(np.int32), err_msg=f"row {i} labels")
        # the supervised region exists and ends with eos unless truncated
        live = our_lab_rows[i][our_lab_rows[i] != -100]
        assert live.size > 0


def test_oracle_catches_displacement(setup):
    """The comparison actually has teeth: a one-token cue displacement
    (dropping the cue's bos — the likeliest silent mistake) fails."""
    cfg, model, tok, q, table, params, modal_np, modal_pt, E = setup

    class NoBosCueTok:
        def __init__(self, inner):
            self._inner = inner
            self.pad_token_id = inner.pad_token_id
            self.bos_token_id = inner.bos_token_id
            self.eos_token_id = inner.eos_token_id

        def encode(self, text, add_special_tokens=False):
            if text in (" video: ", " audio: "):
                return self._inner.encode(text, add_special_tokens=False)
            return self._inner.encode(
                text, add_special_tokens=add_special_tokens)

    ref_emb, ref_att = reference_generate_assembly(
        NoBosCueTok(tok), E, modal_pt, TEXT_INPUT, TIMESTAMPS.tolist(),
        DURATIONS, q)

    text = model.prepare_text(TEXT_INPUT, TIMESTAMPS, DURATIONS)
    modal = {m: jnp.asarray(v) for m, v in modal_np.items()}
    prefix, pmask = model._build_prefix(
        params, modal, jnp.asarray(text.ts_ids), jnp.asarray(text.ts_mask),
        jnp.asarray(text.dur_ids), jnp.asarray(text.dur_mask))
    prompt_emb = model._embed_ids(params, jnp.asarray(text.prompt_ids))
    ours_emb = jnp.concatenate([prefix, prompt_emb], axis=1)
    ours_mask = np.concatenate([np.asarray(pmask), text.prompt_mask], axis=1)

    ref_rows = _valid_rows(ref_emb.numpy(), ref_att.numpy())
    our_rows = _valid_rows(ours_emb, ours_mask)
    assert any(r.shape != o.shape or not np.array_equal(r, o)
               for r, o in zip(ref_rows, our_rows))
