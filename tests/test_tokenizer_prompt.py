import json

import numpy as np
import pytest

from animate3d_tpu.utils.tokenizer import ClipTokenizer
from animate3d_tpu.models.prompt_processor import (
    PromptProcessor,
    direction_ids,
)


@pytest.fixture
def tiny_tokenizer(tmp_path):
    # vocab: byte-level symbols + merged tokens with </w>
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for i, ch in enumerate("abcdefghijklmnopqrstuvwxyz"):
        vocab[ch] = 2 + i
        vocab[ch + "</w>"] = 28 + i
    vocab["he"] = 60
    vocab["he" + "llo</w>".replace("</w>", "") ] = 61  # "hello" pieces
    vocab["llo</w>"] = 62
    vocab["hello</w>"] = 63
    merges = ["h e", "l l", "ll o</w>", "he llo</w>"]
    vp = tmp_path / "vocab.json"
    mp = tmp_path / "merges.txt"
    vp.write_text(json.dumps(vocab))
    mp.write_text("#version\n" + "\n".join(merges))
    return ClipTokenizer(str(vp), str(mp), max_length=8)


def test_tokenizer_bpe_merges(tiny_tokenizer):
    ids = tiny_tokenizer("hello")
    assert ids.shape == (1, 8)
    assert ids[0, 0] == 0  # bos
    assert ids[0, 1] == 63  # fully merged "hello</w>"
    assert ids[0, 2] == 1  # eos
    assert np.all(ids[0, 3:] == 1)  # eos padding


def test_tokenizer_lowercase_and_whitespace(tiny_tokenizer):
    a = tiny_tokenizer("HeLLo")
    b = tiny_tokenizer("  hello  ")
    np.testing.assert_array_equal(a, b)


def test_tokenizer_truncation(tiny_tokenizer):
    ids = tiny_tokenizer("a b c d e f g h i j")
    assert ids.shape == (1, 8)
    assert ids[0, -1] == 1  # ends with eos


def test_prompt_processor_cache(tmp_path):
    calls = []

    def encode(prompts):
        calls.append(prompts)
        return np.ones((len(prompts), 7, 4), np.float32) * len(prompts[0])

    pp = PromptProcessor(encode, cache_dir=str(tmp_path))
    out1 = pp("a dragon", "")
    assert len(calls) == 2  # prompt + negative
    out2 = pp("a dragon", "")
    assert len(calls) == 2  # cached — no new encodes
    np.testing.assert_array_equal(out1["cond"], out2["cond"])


def test_view_dependent_prompting(tmp_path):
    pp = PromptProcessor(lambda ps: np.full((len(ps), 2, 2), float(len(ps[0]))),
                         cache_dir=str(tmp_path))
    out = pp("cat", view_dependent=True)
    assert out["cond"].shape[0] == 4  # side/front/back/overhead


def test_direction_ids():
    elev = np.zeros(4)
    azim = np.array([0.0, 90.0, 180.0, -90.0])
    ids = direction_ids(elev, azim)
    assert ids[0] == 1  # front
    assert ids[1] == 0  # side
    assert ids[2] == 2  # back
    assert ids[3] == 0  # side
    assert direction_ids(np.array([80.0]), np.array([0.0]))[0] == 3  # overhead
