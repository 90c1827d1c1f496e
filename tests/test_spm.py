"""Pure-python sentencepiece tokenizer: proto wire parsing + unigram
Viterbi, against a synthesized spiece.model."""

import struct

import numpy as np
import pytest

from reflectionflow_tpu.utils.spm import (
    BYTE,
    CONTROL,
    NORMAL,
    SPMTokenizer,
    UNKNOWN,
    UnigramTokenizer,
    parse_model_proto,
)


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _piece(piece: str, score: float, ptype: int) -> bytes:
    p = piece.encode()
    sub = b"\x0a" + _varint(len(p)) + p  # field 1, wire 2
    sub += b"\x15" + struct.pack("<f", score)  # field 2, wire 5
    sub += b"\x18" + _varint(ptype)  # field 3, wire 0
    return b"\x0a" + _varint(len(sub)) + sub  # ModelProto field 1


@pytest.fixture(scope="module")
def model_file(tmp_path_factory):
    pieces = [
        ("<pad>", 0.0, CONTROL),
        ("</s>", 0.0, CONTROL),
        ("<unk>", 0.0, UNKNOWN),
        ("▁hello", -1.0, NORMAL),
        ("▁world", -2.0, NORMAL),
        ("▁", -10.0, NORMAL),
        ("he", -6.0, NORMAL),
        ("llo", -6.0, NORMAL),
        ("wor", -6.0, NORMAL),
        ("ld", -6.0, NORMAL),
        ("<0x41>", -20.0, BYTE),  # 'A'
        ("<0x42>", -20.0, BYTE),  # 'B'
    ]
    data = b"".join(_piece(*p) for p in pieces)
    # add an unknown top-level field (normalizer spec) to exercise skipping
    data += b"\x22" + _varint(3) + b"abc"
    path = tmp_path_factory.mktemp("spm") / "spiece.model"
    path.write_bytes(data)
    return str(path)


def test_parse(model_file):
    with open(model_file, "rb") as f:
        entries = parse_model_proto(f.read())
    assert len(entries) == 12
    assert entries[3] == ("▁hello", -1.0, NORMAL)
    assert entries[2][2] == UNKNOWN


def test_viterbi_prefers_whole_words(model_file):
    tok = UnigramTokenizer.from_file(model_file)
    ids = tok.encode_text("hello world")
    assert ids == [tok.vocab["▁hello"], tok.vocab["▁world"]]


def test_viterbi_subword_split(model_file):
    tok = UnigramTokenizer.from_file(model_file)
    # "helloworld" (no space): no single piece; best split uses subwords
    ids = tok.encode_text("helloworld")
    assert ids[0] == tok.vocab["▁hello"]
    assert ids[1:] == [tok.vocab["wor"], tok.vocab["ld"]]


def test_byte_fallback(model_file):
    tok = UnigramTokenizer.from_file(model_file)
    ids = tok.encode_text("AB")
    # '▁' then byte pieces for A and B (byte pieces are reachable only via
    # fallback, not by literal "<0x41>" text — checked below)
    assert tok.byte_ids[0x41] in ids and tok.byte_ids[0x42] in ids
    literal = tok.encode_text("<0x41>")
    assert tok.byte_ids[0x41] not in literal or literal.count(tok.byte_ids[0x41]) < 2


def test_control_pieces_unmatchable(model_file):
    tok = UnigramTokenizer.from_file(model_file)
    ids = tok.encode_text("hello</s>world")
    assert 1 not in ids  # </s> id must not be producible from literal text


def test_normalization(model_file):
    tok = UnigramTokenizer.from_file(model_file)
    assert tok.encode_text("hello\nworld") == tok.encode_text("hello world")
    assert tok.encode_text("hello  world") == tok.encode_text("hello world")


def test_batch_interface(model_file):
    spm = SPMTokenizer(model_file, eos_token_id=1)
    out = spm(["hello world", "hello"], max_length=6)
    assert out["input_ids"].shape == (2, 6)
    assert out["input_ids"][0, 2] == 1  # EOS after 2 tokens
    assert out["attention_mask"][0].sum() == 3
    assert out["input_ids"][1, 1] == 1


def test_reference_train_yaml_layout(tmp_path):
    """TrainConfig accepts the reference config.yaml structure."""
    import yaml

    from reflectionflow_tpu.config import TrainConfig

    data = {
        "model_path": "black-forest-labs/FLUX.1-dev",
        "dtype": "bfloat16",
        "train": {
            "batch_size": 8,
            "accumulate_grad_batches": 1,
            "save_interval": 2000,
            "max_steps": -1,
            "save_path": "./runs/test",
            "dataset": {
                "type": "img",
                "path": "genref_{0..208}.tar",
                "split_ratios": {"general": [0.1, 0.3], "editing": [0.7, 0.0]},
                "training_stages": [0, 5000],
            },
            "lora_config": {"r": 32, "lora_alpha": 32, "init_lora_weights": "gaussian"},
            "optimizer": {"type": "Prodigy", "params": {"lr": 1, "weight_decay": 0.01}},
        },
    }
    path = tmp_path / "ref.yaml"
    path.write_text(yaml.safe_dump(data))
    cfg = TrainConfig.load(str(path))
    assert cfg.optimizer.name == "prodigy" and cfg.optimizer.lr == 1
    assert cfg.lora.r == 32
    assert cfg.data.batch_size == 8
    assert cfg.data.training_stages == (0, 5000)
    assert cfg.split_ratios["editing"] == [0.7, 0.0]
    assert cfg.checkpoint_dir == "./runs/test"


def test_reflection_parsing():
    from reflectionflow_tpu.reflect.parsing import flatten_reflection, parse_reflection_sections

    text = (
        "1. Missing objects:\n- add a second cat\n- add a hat\n\n"
        "2. Color issues:  \n- None\n\n"
        "3. Layout:\n- move the dog left"
    )
    sections = parse_reflection_sections(text)
    assert "Missing objects" in sections and len(sections["Missing objects"]) == 2
    flat = flatten_reflection(text)
    assert "add a second cat" in flat and "move the dog left" in flat
    assert "None" not in flat
    # unstructured text passes through
    assert flatten_reflection("just fix the colors") == "just fix the colors"
