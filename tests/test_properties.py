"""Property-based tests (hypothesis): engine expressions vs independent
Python reference implementations, whole generated batches per Spark job."""

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from scholarmind_spark.functions.doi import doi_norm
from scholarmind_spark.operators.dedup import priority_dedup

# printable-ish text incl. the DOI grammar's special tokens
doi_text = st.one_of(
    st.none(),
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40),
    st.builds(
        lambda core, pre, suf: f"{pre}{core}{suf}",
        core=st.from_regex(r"10\.[0-9]{2,6}/[A-Za-z0-9._-]{1,20}", fullmatch=True),
        pre=st.sampled_from(["", "https://doi.org/", "doi:", "DOI:", "junk, "]),
        suf=st.sampled_from(["", " [doi]", " [pii]", "  "]),
    ),
)


def doi_norm_reference(v: str | None) -> str | None:
    """Independent reimplementation of D1 (main.py:79-99 semantics)."""
    if v is None:
        return None
    s = v.replace(" [doi]", "").replace(" [pii]", "")
    if "," in s:
        parts = [p.strip() for p in s.split(",")]
        # a "10." part wins; otherwise the WHOLE string is kept (main.py:87-96)
        s = next((p for p in parts if p.startswith("10.")), s)
    # prefix strip is case-sensitive and pre-trim, like main.py:140-143
    if s.startswith("https://doi.org/"):
        s = s[16:]
    elif s.startswith("doi:"):
        s = s[4:]
    return s.strip().lower()


@settings(max_examples=15, deadline=None)
@given(st.lists(doi_text, min_size=1, max_size=30))
def test_doi_norm_matches_reference(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "doi string")
    got = [r["n"] for r in df.select(doi_norm(F.col("doi")).alias("n")).collect()]
    want = [doi_norm_reference(v) for v in vals]
    assert got == want


records = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=99),  # record_id (unique-ified below)
        st.sampled_from(["wos", "pubmed", "sciencedirect", "other"]),
        st.one_of(st.none(), st.sampled_from(["", "10.1/a", "10.1/b", "10.2/c"])),
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=15, deadline=None)
@given(records)
def test_priority_dedup_invariants(spark, rows):
    rows = [(i, s, d) for i, (_, s, d) in enumerate(rows)]  # unique record_id
    df = spark.createDataFrame(rows, "record_id long, source_type string, doi string")
    out = priority_dedup(df, keep_key=True).collect()

    prio = {"wos": 3, "pubmed": 2, "sciencedirect": 1}
    keyed = {}
    empties = 0
    for i, s, d in rows:
        k = d.strip().lower() if d else ""
        if k == "":
            empties += 1
        else:
            keyed.setdefault(k, []).append((prio.get(s, 0), -i, i, s))
    # survivor count: every empty-key row + one per distinct key
    assert len(out) == empties + len(keyed)
    # survivor identity: max priority, then smallest record_id
    survivors = {r["doi_norm"]: r for r in out if r["doi_norm"] != ""}
    for k, cands in keyed.items():
        want = max(cands)
        assert survivors[k]["record_id"] == want[2], k
        assert survivors[k]["source_type"] == want[3], k


# ---- merge_upsert: independent reference + algebraic properties

word = st.text(alphabet="abcdefgh", min_size=1, max_size=3)
merge_rows = st.lists(
    st.tuples(st.integers(0, 6), word, st.integers(1, 4)), min_size=0, max_size=15
)


def merge_reference(snap, upd):
    """One winner per key: highest version; updates beat snapshot on ties."""
    out = {}
    for side, rows in ((1, snap), (0, upd)):
        for k, v, ver in rows:
            cur = out.get(k)
            if cur is None or ver > cur[2] or (ver == cur[2] and side < cur[0]):
                out[k] = (side, v, ver)
    return {k: (v, ver) for k, (side, v, ver) in out.items()}


@settings(max_examples=10, deadline=None)
@given(snap=merge_rows, upd=merge_rows)
def test_merge_upsert_matches_reference(spark, snap, upd):
    from scholarmind_spark.operators.merge import merge_upsert

    # merge_reference resolves duplicate keys WITHIN a side by the same
    # version/side rule; merge_upsert sees them as extra candidate rows of
    # that side, which is the same outcome — but val ties at equal version
    # within one side are arbitrary in both, so dedup inputs per (key,
    # version, side) first to keep the property exact
    def dedup(rows):
        return list({(k, ver): (k, v, ver) for k, v, ver in rows}.values())

    snap, upd = dedup(snap), dedup(upd)
    s = spark.createDataFrame(snap + [(99, "pad", 1)], "id int, val string, version int")
    u = spark.createDataFrame(upd + [(98, "pad", 1)], "id int, val string, version int")
    got = {
        r.id: (r.val, r.version)
        for r in merge_upsert(s, u, "id", version_col="version").collect()
        if r.id < 90
    }
    assert got == merge_reference(snap, upd)


@settings(max_examples=5, deadline=None)
@given(snap=merge_rows, upd=merge_rows)
def test_merge_upsert_idempotent(spark, snap, upd):
    """Re-applying the same update batch changes nothing (exactly-once
    follows for foreachBatch retries)."""
    from scholarmind_spark.operators.merge import merge_upsert

    snap = list({(k, ver): (k, v, ver) for k, v, ver in snap}.values())
    upd = list({(k, ver): (k, v, ver) for k, v, ver in upd}.values())
    s = spark.createDataFrame(snap + [(99, "pad", 1)], "id int, val string, version int")
    u = spark.createDataFrame(upd + [(98, "pad", 1)], "id int, val string, version int")
    once = merge_upsert(s, u, "id", version_col="version")
    twice = merge_upsert(once, u, "id", version_col="version")
    canon = lambda df: sorted((r.id, r.val, r.version) for r in df.collect())
    assert canon(twice) == canon(once)


# ---- word_repetition vs a pure-Python reference

@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(word, min_size=1, max_size=12), min_size=1, max_size=6
    )
)
def test_word_repetition_matches_reference(spark, docs):
    from collections import Counter

    from scholarmind_spark.operators.textstats import word_repetition

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], "doc_id long, text string"
    )
    got = {r.id: r for r in word_repetition(df).collect()}
    for i, ws in enumerate(docs):
        c = Counter(ws)
        n = sum(c.values())
        assert got[i].n_words == n and got[i].n_distinct == len(c)
        assert got[i].top_word_frac == round(max(c.values()) / n, 6)
        dup = sum(v for v in c.values() if v > 1)
        assert got[i].dup_word_frac == round(dup / n, 6)


# ---- PubMed tagged-text parse: generative serialize → parse round-trip

pm_word = st.text(alphabet="abcdefghij", min_size=1, max_size=6)
pm_value = st.lists(pm_word, min_size=1, max_size=5).map(" ".join)
pm_tag = st.sampled_from(["PMID", "TI", "AB", "TA", "DP"])
pm_record = st.dictionaries(pm_tag, st.lists(pm_value, min_size=1, max_size=2),
                            min_size=1, max_size=5)


def _serialize(records, split_continuations):
    """Render records in PubMed tagged-text form; optionally emit multi-word
    values as a tag line plus an indented continuation line (the parser
    re-joins with a single space, so the round-trip is exact)."""
    out = []
    for rec in records:
        for tag, values in rec.items():
            for v in values:
                words = v.split(" ")
                if split_continuations and len(words) >= 2:
                    out.append(f"{tag}  - {words[0]}")
                    out.append(f"      {' '.join(words[1:])}")
                else:
                    out.append(f"{tag}  - {v}")
        out.append("")
    return "\n".join(out)


@settings(max_examples=25, deadline=None)
@given(records=st.lists(pm_record, min_size=1, max_size=4), split=st.booleans())
def test_pubmed_tag_parse_round_trips(records, split):
    from scholarmind_spark.sources.pubmed import parse_pubmed_tags

    text = _serialize(records, split)
    assert parse_pubmed_tags(text) == records


# ---- WOS tagged-text parse: generative serialize → parse round-trip

wos_scalar_tag = st.sampled_from(["TI", "AB", "SO", "DI", "PY"])
wos_record = st.tuples(
    pm_value,                                      # PT value
    st.dictionaries(wos_scalar_tag, st.lists(pm_value, min_size=1, max_size=1),
                    min_size=0, max_size=4),
    st.lists(pm_value, min_size=0, max_size=3),    # AU lines (multi-tag)
)


def _serialize_wos(records, split):
    """WOS Plain Text form: FN/VR header, PT starts a record, 2-char field
    lines, 3-space continuations (AU is one-element-per-line), ER/EF."""
    out = ["FN Test Export", "VR 1.0"]
    for pt, fields, aus in records:
        out.append(f"PT {pt}")
        for tag, values in fields.items():
            for v in values:
                words = v.split(" ")
                if split and len(words) >= 2:
                    out.append(f"{tag} {words[0]}")
                    out.append(f"   {' '.join(words[1:])}")
                else:
                    out.append(f"{tag} {v}")
        if aus:
            out.append(f"AU {aus[0]}")
            for a in aus[1:]:
                out.append(f"   {a}")
        out.append("ER")
    out.append("EF")
    return "\n".join(out)


@settings(max_examples=25, deadline=None)
@given(records=st.lists(wos_record, min_size=1, max_size=3), split=st.booleans())
def test_wos_tag_parse_round_trips(records, split):
    from scholarmind_spark.sources.wos import parse_wos_tags

    got = parse_wos_tags(_serialize_wos(records, split))
    want = []
    for pt, fields, aus in records:
        rec = {"PT": [pt]}
        for tag, values in fields.items():
            rec[tag] = list(values)
        if aus:
            rec["AU"] = list(aus)
        want.append(rec)
    assert got == want


# --- PassJoin fuzzy_link losslessness (operators/linkage.py) ------------

_key = st.text(alphabet="abcxyz", min_size=1, max_size=8)


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[-1]


@settings(max_examples=8, deadline=None)
@given(st.lists(_key, min_size=2, max_size=14, unique=True))
def test_fuzzy_link_lossless_property(spark, keys):
    """Segment blocking must emit EXACTLY the brute-force lev<=2 pair set
    — short keys over a tiny alphabet stress the tiny-key path, segment
    boundaries, and length tolerance simultaneously."""
    import itertools

    from scholarmind_spark.operators.linkage import fuzzy_link

    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = {(r["a"], r["b"], r["dist"]) for r in fuzzy_link(df, "k").collect()}
    want = {
        (min(x, y), max(x, y), _lev(x, y))
        for x, y in itertools.combinations(sorted(keys), 2)
        if _lev(x, y) <= 2
    }
    assert got == want
