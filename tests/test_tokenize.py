import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from quickray.tokenize import Tokenizer, doc_lengths, flatten_tokens, tokenize_py


def _arrow_tokens_per_doc(texts):
    flat, par = flatten_tokens(pa.array(texts, pa.string()))
    out = [[] for _ in texts]
    for t, p in zip(flat.to_pylist(), par.to_pylist()):
        out[p].append(t)
    return out


def test_arrow_matches_python_fixed():
    texts = [
        "Func foo_1 bar()\nbar baz;baz",
        "",
        "  leading and trailing  ",
        "UPPER_case mixedCase123 __dunder__",
        "a.b.c-d:e,f",
        "中文 tokens split ascii only",
        "tab\tsep\nnewline",
    ]
    arrow = _arrow_tokens_per_doc(texts)
    for s, toks in zip(texts, arrow):
        assert toks == tokenize_py(s)


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=120))
def test_arrow_matches_python_property(s):
    assert _arrow_tokens_per_doc([s])[0] == tokenize_py(s)


def test_doc_lengths():
    texts = ["a b c", "", "x;y"]
    assert doc_lengths(pa.array(texts), 3).tolist() == [3, 0, 2]


def test_tokenizer_stage_tf_salt_bits():
    batch = pa.table(
        {
            "doc_id": pa.array([10, 90], pa.int64()),
            "lang": ["go", "py"],
            "path": ["src/a.go", "test/b.py"],
            "content": ["func func x", "def def def y"],
            "doc_len": pa.array([3, 4], pa.int64()),
        }
    )
    tok = Tokenizer(
        hot_ref={"func", "def"}, n_docs=100, num_salts=4, avgdl=3.5,
        langs=["go", "py"],
    )
    out = tok(batch)
    rows = {(r["term"], r["doc_id"]): r for r in out.to_pylist()}
    assert rows[("func", 10)]["tf"] == 2
    assert rows[("def", 90)]["tf"] == 3
    # salts: hot terms use doc_id * S // n_docs, cold terms 0
    assert rows[("func", 10)]["salt"] == 10 * 4 // 100
    assert rows[("def", 90)]["salt"] == 90 * 4 // 100
    assert rows[("x", 10)]["salt"] == 0
    # bits: lang bit, test-path bit 8, long-doc bit 9
    assert rows[("x", 10)]["bits"] == 1 << 0
    assert rows[("y", 90)]["bits"] == (1 << 1) | (1 << 8) | (1 << 9)
    assert rows[("func", 10)]["dl"] == 3
