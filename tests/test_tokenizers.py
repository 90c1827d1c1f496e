"""Contract tests for utils/tokenizers.py — the hermetic-tokenizer seam.

Every synthetic-weights run (tests, benches, smokes) rides HashTokenizer,
so its padding/EOS/truncation contract must stay pinned: the T5 encoder
masks on attention_mask and the prompt-embed cache keys on the ids.
Resolution order mirrors the reference's AutoTokenizer loading
(/root/reference/train_flux/flux/pipeline_tools.py:33-52) with in-repo
fallbacks (no sentencepiece wheel, no network).
"""

import numpy as np

from reflectionflow_tpu.utils.tokenizers import HashTokenizer, load_tokenizer


def test_hash_tokenizer_contract():
    tok = HashTokenizer(vocab_size=100, eos_token_id=1)
    out = tok(["a red cube", ""], max_length=8)
    ids, mask = out["input_ids"], out["attention_mask"]
    assert ids.shape == mask.shape == (2, 8)
    assert ids.dtype == mask.dtype == np.int32
    # three words + EOS, then pad; mask covers exactly the real tokens
    assert ids[0, 3] == 1 and (ids[0, 4:] == 0).all()
    assert mask[0].tolist() == [1, 1, 1, 1, 0, 0, 0, 0]
    # empty text still emits EOS (T5 contract: every sequence ends in </s>)
    assert ids[1, 0] == 1 and mask[1].sum() == 1
    # word ids are deterministic, in-vocab, and never collide with pad/EOS
    again = tok(["a red cube"], max_length=8)["input_ids"]
    assert (again[0] == ids[0]).all()
    assert (ids[0, :3] >= 2).all() and (ids[0, :3] < 100).all()


def test_hash_tokenizer_truncation_keeps_eos():
    tok = HashTokenizer(eos_token_id=1)
    ids = tok(["one two three four five six"], max_length=4)["input_ids"]
    assert ids.shape[1] == 4
    assert ids[0, 3] == 1  # EOS survives truncation at the last slot
    no_eos = HashTokenizer(eos_token_id=1, append_eos=False)
    ids2 = no_eos(["one two three four five six"], max_length=4)["input_ids"]
    assert (ids2[0] >= 2).all()  # CLIP-style: truncate without EOS


def test_load_tokenizer_falls_back_hermetically(tmp_path):
    # no path at all -> HashTokenizer with the requested vocab/EOS
    tok = load_tokenizer(None, "t5", vocab_size=64, eos_token_id=1)
    assert isinstance(tok, HashTokenizer) and tok.vocab_size == 64
    # a directory without tokenizer files -> same fallback, no raise
    tok2 = load_tokenizer(str(tmp_path), "clip", vocab_size=49408, eos_token_id=49407)
    out = tok2(["hello"], max_length=4)
    assert out["input_ids"].shape == (1, 4)
    assert out["input_ids"][0, 1] == 49407
