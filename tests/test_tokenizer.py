import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from luceneindexer_spark.tokenizer import (
    STOPWORDS,
    duckdb_tokens_cte,
    tokenize_batch,
    tokenize_text,
    with_tokens,
)

GOLDEN = [
    ("getUserName", ["get", "user", "name"]),
    ("parse_json_fast", ["parse", "json", "fast"]),
    ("HTTPServer2 response", ["http", "server2", "response"]),
    ("the quick Brown-Fox", ["quick", "brown", "fox"]),
    ("", []),
    (None, []),
    ("THE THE the", []),
    ("XMLHttpRequest", ["xml", "http", "request"]),
    ("foo.bar(baz_qux)", ["foo", "bar", "baz", "qux"]),
    ("a1B2c3", ["a1", "b2c3"]),
    ("  multiple   spaces\tand\nnewlines ", ["multiple", "spaces", "newlines"]),
]


@pytest.mark.parametrize("text,want", GOLDEN)
def test_golden_tokens(text, want):
    assert tokenize_text(text) == want


def test_batch_matches_scalar():
    texts = [t for t, _ in GOLDEN] + ["def mainLoop(): return os.path_join(x)"]
    got = tokenize_batch(pd.Series(texts)).tolist()
    assert got == [tokenize_text(t) for t in texts]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(max_size=80), max_size=30))
def test_batch_matches_scalar_property(texts):
    got = tokenize_batch(pd.Series(texts, dtype=object)).tolist()
    assert got == [tokenize_text(t) for t in texts]


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=120))
def test_zero_width_subs_match_pinned_template_form(s):
    """The hot path implements the pinned spec's two template substitutions
    (\"\\1 \\2\") as zero-width lookaround inserts (constant replacement, no
    per-match Python template expansion) — must be byte-identical."""
    import re
    from luceneindexer_spark.tokenizer import (ACRONYM_RE, ACRONYM_ZW,
                                               CAMEL_RE, CAMEL_ZW)
    tmpl = re.sub(CAMEL_RE, r"\1 \2", re.sub(ACRONYM_RE, r"\1 \2", s))
    zw = re.sub(CAMEL_ZW, " ", re.sub(ACRONYM_ZW, " ", s))
    assert tmpl == zw


def test_idempotent_on_normalized():
    toks = tokenize_text("SomeCamelCase snake_case plainword")
    again = tokenize_text(" ".join(toks))
    assert toks == again


def test_stopwords_removed():
    assert all(s not in tokenize_text(" ".join(STOPWORDS)) for s in STOPWORDS)


def test_duckdb_cte_matches_python():
    texts = [t for t, _ in GOLDEN if t] + ["def mainLoop(): os.path_join(x)"]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    con = duckdb.connect()
    con.register("docs", df)
    sql = f"SELECT doc_id, term FROM ({duckdb_tokens_cte('docs', 'doc_id', 'text')}) ORDER BY doc_id"
    got = con.execute(sql).fetchall()
    want = [(i, t) for i, txt in enumerate(texts) for t in tokenize_text(txt)]
    got_by_doc = {}
    for d, t in got:
        got_by_doc.setdefault(d, []).append(t)
    want_by_doc = {}
    for d, t in want:
        want_by_doc.setdefault(d, []).append(t)
    # row order within doc is not guaranteed by SQL; compare multisets per doc
    assert {k: sorted(v) for k, v in got_by_doc.items()} == {
        k: sorted(v) for k, v in want_by_doc.items()
    }


def test_spark_udf_matches_scalar(spark):
    texts = [t for t, _ in GOLDEN] + ["SparkSQL whole_stage CodeGen"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = with_tokens(df, "text").orderBy("doc_id").collect()
    for r in rows:
        assert r.tokens == tokenize_text(texts[r.doc_id])
        assert r.doclen == len(r.tokens)


def test_numpy_tokenizer_matches_regex_path():
    """tokenize_flat_np (byte-domain) must be token-identical to the default
    regex path on adversarial boundary cases."""
    import numpy as np
    from luceneindexer_spark.tokenizer import tokenize_flat, tokenize_flat_np

    docs = [
        "getUserName parse_json_fast HTTPServer2 HTML5x the a of",
        "XMLParser AAb Ab x01\x01weird", "", "   ",
        "camelCaseX YCamel ABCdEFGh xABc", "ünïcödé Überraschung",
        "a" * 300 + "B" + "c" * 5, "123 456abc ABC123 a1B2c3",
        "UPPERONLY", "the the the",
    ]
    a = tokenize_flat(np.array(docs, dtype=object))
    b = tokenize_flat_np(np.array(docs, dtype=object))

    def expand(u, c, k):
        toks = [u[i] for i in c]
        out, p = [], 0
        for cnt in k:
            out.append(toks[p:p + cnt])
            p += cnt
        return out

    assert expand(*a) == expand(*b)


def test_arrow_tokenizer_honors_validity_bitmap():
    """Null slots may carry non-empty UNDEFINED byte extents (Arrow spec;
    arrays from take/filter kernels do this) — the arrow tokenizer must mask
    them via the validity bitmap, not tokenize the garbage bytes."""
    import numpy as np
    import pyarrow as pa
    from luceneindexer_spark.tokenizer import (tokenize_flat,
                                               tokenize_flat_arrow)

    data = b"fooBarGARBAGEbytesbazQux"
    offsets = np.array([0, 6, 21, 24], dtype=np.int32)  # 3 slots
    validity = bytearray([0b101])                       # middle slot null
    arr = pa.StringArray.from_buffers(
        3, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data),
        pa.py_buffer(bytes(validity)), null_count=1)
    assert arr.null_count == 1 and arr[0].as_py() == "fooBar"

    u, c, k = tokenize_flat_arrow(arr)
    want_u, want_c, want_k = tokenize_flat(
        np.array(["fooBar", "", "Qux"], dtype=object))

    def expand(u, c, k):
        toks = [u[i] for i in c]
        out, p = [], 0
        for cnt in k:
            out.append(toks[p:p + cnt])
            p += cnt
        return out

    assert expand(u, c, k) == expand(want_u, want_c, want_k)
    assert list(k) == [2, 0, 1]  # foo bar | (null) | qux

    # sliced arrays (non-zero arr.offset) keep working on the no-null path
    plain = pa.array(["alphaOne betaTwo", "gammaThree", "deltaFour"]).slice(1)
    u2, c2, k2 = tokenize_flat_arrow(plain)
    w2 = tokenize_flat(np.array(["gammaThree", "deltaFour"], dtype=object))
    assert expand(u2, c2, k2) == expand(*w2)
