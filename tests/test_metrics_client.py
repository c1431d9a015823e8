"""EasyScholar response semantics (journal_metrics.py:96-194): officialRank
select-over-all, customRank &&& parsing, graceful degradation."""

from scholarmind_spark.metrics_client import make_fetch_one, parse_metrics_response

METRICS = ["sciif", "sci", "custom_MYDS"]
MAPPING = {"sciif": "impact_factor", "sci": "sci", "custom_MYDS": "my_rank"}


def _payload(official_rank=None, custom_rank=None, code=200, data="present"):
    body = {"officialRank": official_rank, "customRank": custom_rank}
    return {"code": code, "data": body if data == "present" else data}


def test_select_preferred_over_all():
    data = _payload(
        official_rank={
            "select": {"sciif": "9.9", "sci": "Q1"},
            "all": {"sciif": "1.1", "sci": "Q4"},
        }
    )
    out = parse_metrics_response(data, METRICS, MAPPING)
    assert out == {"impact_factor": "9.9", "sci": "Q1", "my_rank": ""}


def test_fallback_to_all_when_select_empty():
    for select in (None, {}):
        data = _payload(official_rank={"select": select, "all": {"sciif": "2.5"}})
        out = parse_metrics_response(data, METRICS, MAPPING)
        assert out["impact_factor"] == "2.5"
        assert out["sci"] == ""  # missing metric → "" (journal_metrics.py:145)


def test_no_data_at_all_returns_empty_shape():
    data = _payload(official_rank={"select": None, "all": None})
    assert parse_metrics_response(data, METRICS, MAPPING) == {
        "impact_factor": "", "sci": "", "my_rank": "",
    }


def test_malformed_payloads_degrade():
    empty = {"impact_factor": "", "sci": "", "my_rank": ""}
    assert parse_metrics_response("nonsense", METRICS, MAPPING) == empty
    assert parse_metrics_response({"code": 500, "data": {}}, METRICS, MAPPING) == empty
    assert parse_metrics_response({"code": 200}, METRICS, MAPPING) == empty
    assert parse_metrics_response(_payload(data=None), METRICS, MAPPING) == empty


def test_custom_rank_parsing():
    data = _payload(
        official_rank={"all": {"sciif": "3.0"}},
        custom_rank={
            "rankInfo": [
                {"uuid": "u1", "abbName": "MYDS", "twoRankText": "Tier-B"},
                {"uuid": "u2", "abbName": "OTHER", "oneRankText": "Top"},
                "not-a-dict",
            ],
            "rank": ["u1&&&2", "u2&&&1", "u9&&&3", "u1&&&9", "u1", 42],
        },
    )
    out = parse_metrics_response(data, METRICS, MAPPING)
    # "<uuid>&&&<n>" → rankInfo[uuid].<n>RankText, surfaced "ABB text";
    # unknown uuid / rank number / malformed entries are skipped silently
    assert out == {"impact_factor": "3.0", "sci": "", "my_rank": "MYDS Tier-B"}


def test_custom_rank_empty_text_yields_empty():
    data = _payload(
        official_rank={"all": {}},
        custom_rank={
            "rankInfo": [{"uuid": "u1", "abbName": "MYDS"}],  # no rank text
            "rank": ["u1&&&2"],
        },
    )
    assert parse_metrics_response(data, METRICS, MAPPING)["my_rank"] == ""


def test_fetch_one_transport():
    calls = []

    def fake_get(url, params):
        calls.append((url, params))
        return _payload(official_rank={"select": {"sciif": "7.7"}})

    fetch = make_fetch_one("KEY", METRICS, MAPPING, http_get=fake_get)
    out = fetch("nature")
    assert out["impact_factor"] == "7.7"
    assert calls[0][1] == {"secretKey": "KEY", "publicationName": "nature"}

    def boom(url, params):
        raise OSError("offline")

    assert make_fetch_one("KEY", METRICS, MAPPING, http_get=boom)("x") == {
        "impact_factor": "", "sci": "", "my_rank": "",
    }
    # no key / no metrics short-circuits without transport
    assert make_fetch_one("", METRICS, http_get=boom)("x") == {}
    assert make_fetch_one("KEY", [], http_get=boom)("x") == {}


def test_end_to_end_enrich(spark):
    """fetch_one → fetch_metrics_df → broadcast enrich join round-trip."""
    from pyspark.sql import functions as F

    from scholarmind_spark.operators.enrich import enrich_with_metrics, fetch_metrics_df

    def fake_get(url, params):
        j = params["publicationName"]
        return _payload(official_rank={"select": {"impact_factor": f"if-{j}", "sci": "Q2", "CAS_Zone": "Z1"}})

    fetch = make_fetch_one("KEY", ["impact_factor", "sci", "CAS_Zone"], http_get=fake_get)
    mdf = fetch_metrics_df(spark, ["journal a", "journal b"], fetch, min_interval_s=0.0)
    df = spark.createDataFrame(
        [("Journal A",), ("Journal B",), ("Unknown",)], ["journal"]
    ).withColumn("record_id", F.monotonically_increasing_id())
    out = {r["journal"]: r for r in enrich_with_metrics(df, mdf).collect()}
    assert out["Journal A"]["impact_factor"] == "if-journal a"
    assert out["Unknown"]["impact_factor"] == ""  # unmatched → '' fill


def test_pipeline_online_fetch_with_custom_columns(spark):
    """metrics_fetch_one drives distinct-journals → fetch → broadcast join
    inside the pipeline, with a custom metric column mapping."""
    import os

    from scholarmind_spark.pipeline import PipelineConfig, run_pipeline

    FIX = os.path.join(os.path.dirname(__file__), "fixtures")

    def fake_get(url, params):
        return _payload(
            official_rank={"all": {"sciif": "4.2"}},
            custom_rank={
                "rankInfo": [{"uuid": "u1", "abbName": "MYDS", "threeRankText": "mid"}],
                "rank": ["u1&&&3"],
            },
        )

    fetch = make_fetch_one("KEY", METRICS, MAPPING, http_get=fake_get)
    cfg = PipelineConfig(sources={"pubmed": f"{FIX}/pubmed.txt"}, metrics_fetch_one=fetch)
    rows = run_pipeline(spark, cfg).collect()
    with_journal = [r for r in rows if r["journal"]]
    assert with_journal
    r = with_journal[0].asDict()
    assert r["impact_factor"] == "4.2"
    assert r["my_rank"] == "MYDS mid"
    # null-journal records still get the ''-filled metric columns
    for r in rows:
        if not r["journal"]:
            assert r["impact_factor"] == ""


def test_numeric_api_values_coerced_to_strings():
    """JSON numbers (or a hostile server's lists/dicts) in officialRank
    must not abort the all-StringType createDataFrame downstream."""
    from scholarmind_spark.metrics_client import parse_metrics_response

    data = {"code": 200, "data": {"officialRank": {"all": {
        "sciif": 4.32, "sci": ["Q1"], "jci": None}}}}
    out = parse_metrics_response(data, ["sciif", "sci", "jci"], {})
    assert out["sciif"] == "4.32"
    assert out["sci"] == "" and out["jci"] == ""
