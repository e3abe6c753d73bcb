import numpy as np
import pyarrow as pa
import pytest
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


def test_flatten_tokens_byte_path_equals_re():
    """The byte-level tokenizer variant must be byte-for-byte identical
    to the RE2 default on every edge shape: nulls, empties, unicode
    (multi-byte separators; K -> ascii 'k' lowering), slices, chunks."""
    import numpy as np

    from quickray.tokenize import flatten_tokens, flatten_tokens_byte

    cases = [
        pa.array(
            ["hello world", "", None, "a_b-c__d", "  x  ",
             "ÜBER K gross", "中文 test 漢字", "1337_leet", "òàé", "ΣΙΓΜΑ"]
        ),
        pa.array([], pa.string()),
        pa.array(["", "", ""]),
        pa.chunked_array([pa.array(["aa bb"]), pa.array(["cc", "dd ee"])]),
    ]
    big = pa.array([f"line{i} alpha_beta {i%7}x" for i in range(500)])
    cases.append(big.slice(37, 200))
    for arr in cases:
        f1, p1 = flatten_tokens(arr)
        f2, p2 = flatten_tokens_byte(arr)
        assert f1.to_pylist() == f2.to_pylist()
        assert np.array_equal(np.asarray(p1), np.asarray(p2))


def test_rank_lookup_fixed_width_probe():
    """searchsorted probe == pc.index_in on sorted keys; overlong and
    missing keys raise; non-ascii keys take the scatter fallback."""
    import numpy as np
    import pyarrow.compute as pc

    from quickray.tokenize import _fixed_bytes, rank_lookup, rank_probe_np, row_keys

    repos = [f"org{i%5:03d}" for i in range(50)]
    paths = [f"p{i:04d}.go" for i in range(50)]
    keys = pa.table({"repo": pa.array(repos), "path": pa.array(paths)})
    from quickray.docids import rank_keys

    ranked = rank_keys(keys)
    rn = rank_probe_np(ranked)
    got = rank_lookup(keys, None, rn)
    ref = pc.index_in(row_keys(keys), value_set=ranked).cast(pa.int64())
    assert got.equals(ref)
    with pytest.raises(ValueError, match="missing"):
        rank_lookup(
            pa.table({"repo": pa.array(["zz"]), "path": pa.array(["q"])}),
            None, rn,
        )
    with pytest.raises(ValueError, match="missing"):
        rank_lookup(
            pa.table({"repo": pa.array(["r" * 99]), "path": pa.array(["p" * 99])}),
            None, rn,
        )
    # non-ascii fallback keeps exact bytes
    arr = pa.array(["zü-key", "a-key", "m"])
    fb = _fixed_bytes(arr, 12)
    assert [f.rstrip(b"\x00").decode() for f in fb] == ["zü-key", "a-key", "m"]


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(max_size=60), max_size=8))
def test_flatten_byte_equals_re_property(texts):
    from quickray.tokenize import flatten_tokens, flatten_tokens_byte

    arr = pa.array(texts, pa.string())
    f1, p1 = flatten_tokens(arr)
    f2, p2 = flatten_tokens_byte(arr)
    assert f1.to_pylist() == f2.to_pylist()
    assert np.asarray(p1).tolist() == np.asarray(p2).tolist()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_characters="\x00\x01",
                                   max_codepoint=0x2FF),
            min_size=1, max_size=20,
        ),
        min_size=1, max_size=40, unique=True,
    )
)
def test_fixed_bytes_order_preserving(keys):
    """Padded fixed-width bytes must sort exactly like the source
    strings (UTF-8 byte order), for ascii and non-ascii alike."""
    from quickray.tokenize import _fixed_bytes

    arr = pa.array(sorted(keys), pa.string())
    width = max(len(k.encode()) for k in keys)
    fb = _fixed_bytes(arr, width)
    assert list(fb) == sorted(fb)
    roundtrip = [f.rstrip(b"\x00").decode() for f in fb]
    assert roundtrip == sorted(keys)
