"""EasyScholar journal-metrics response semantics (reference
``src/api/journal_metrics.py:96-194``).

The reference's client hides real data semantics a user gets wrong without
them:

- **officialRank select-over-all preference** (journal_metrics.py:127-134):
  the ``select`` collection wins when non-empty, else ``all``, else nothing.
- **customRank ``&&&`` encoding** (journal_metrics.py:147-185): each rank
  entry is ``"<uuid>&&&<rank_number>"``; the uuid keys into ``rankInfo``,
  the rank number (1-5) picks ``oneRankText``..``fiveRankText``, and the
  surfaced value is ``"<abbName> <rank_text>"``.
- **graceful degradation**: malformed payloads, non-200 codes, and missing
  sections all yield the empty per-metric mapping, never an exception.

The parse is pure driver-side Python (it shapes the tiny metrics lookup
before it becomes a broadcast DataFrame — see ``operators/enrich.py``);
transport is injectable so tests and offline runs need no network.
"""

from __future__ import annotations

from collections.abc import Callable

EASYSCHOLAR_URL = "https://www.easyscholar.cc/open/getPublicationRank"

# rank number → rankInfo text field (journal_metrics.py:168-175)
RANK_FIELD_BY_NUMBER = {
    "1": "oneRankText",
    "2": "twoRankText",
    "3": "threeRankText",
    "4": "fourRankText",
    "5": "fiveRankText",
}


def empty_metrics(
    metrics_to_fetch: list[str], metrics_column_mapping: dict[str, str] | None = None
) -> dict[str, str]:
    """All-empty result with the configured output shape
    (journal_metrics.py:97)."""
    mapping = metrics_column_mapping or {}
    return {mapping.get(m, m): "" for m in metrics_to_fetch}


def parse_metrics_response(
    data: object,
    metrics_to_fetch: list[str],
    metrics_column_mapping: dict[str, str] | None = None,
) -> dict[str, str]:
    """Parse one API payload into the per-journal metrics dict
    (journal_metrics.py:96-194).

    Always returns the full configured column shape (the reference's
    ``result`` can omit unmatched custom keys; the pre-built
    ``empty_result`` shape it documents as the contract is honored here by
    merging over it)."""
    mapping = metrics_column_mapping or {m: m for m in metrics_to_fetch}
    result = empty_metrics(metrics_to_fetch, mapping)

    if not isinstance(data, dict) or data.get("code") != 200:
        return result
    api = data.get("data")
    if not isinstance(api, dict):
        return result

    official_rank = api.get("officialRank")
    official_rank = official_rank if isinstance(official_rank, dict) else {}
    if official_rank.get("all") is None and official_rank.get("select") is None:
        return result  # journal has no data at all (journal_metrics.py:122-124)

    # select preferred over all (journal_metrics.py:127-134)
    official = official_rank.get("select") or official_rank.get("all") or {}
    for metric in metrics_to_fetch:
        if metric.startswith("custom_"):
            continue  # handled from customRank below
        v = official.get(metric, "")
        # the API (or a hostile server) may encode values as JSON numbers;
        # the metrics schema is all-StringType, and a float here aborts
        # the whole enrichment loop at createDataFrame — coerce scalars,
        # blank non-scalars
        if v is None or isinstance(v, (list, dict)):
            v = ""
        elif not isinstance(v, str):
            v = str(v)
        result[mapping.get(metric, metric)] = v

    custom_rank = api.get("customRank")
    if (
        isinstance(custom_rank, dict)
        and custom_rank.get("rankInfo") is not None
        and custom_rank.get("rank") is not None
        and any(m.startswith("custom_") for m in metrics_to_fetch)
    ):
        rank_info = {
            item["uuid"]: item
            for item in custom_rank["rankInfo"]
            if isinstance(item, dict) and "uuid" in item
        }
        for rank_item in custom_rank["rank"]:
            if not isinstance(rank_item, str):
                continue
            parts = rank_item.split("&&&")  # "<uuid>&&&<rank_number>"
            if len(parts) != 2:
                continue
            uuid, rank_number = parts
            dataset = rank_info.get(uuid)
            if not isinstance(dataset, dict):
                continue
            abb_name = dataset.get("abbName", "")
            rank_field = RANK_FIELD_BY_NUMBER.get(rank_number)
            if not rank_field:
                continue
            rank_text = dataset.get(rank_field, "")
            custom_key = f"custom_{abb_name}"
            if custom_key in metrics_to_fetch:
                result[mapping.get(custom_key, custom_key)] = (
                    f"{abb_name} {rank_text}" if rank_text else ""
                )
    return result


def _default_http_get(url: str, params: dict[str, str]) -> object:
    import json
    import urllib.parse
    import urllib.request

    with urllib.request.urlopen(f"{url}?{urllib.parse.urlencode(params)}", timeout=10) as r:
        return json.loads(r.read().decode())


def make_fetch_one(
    api_key: str,
    metrics_to_fetch: list[str],
    metrics_column_mapping: dict[str, str] | None = None,
    http_get: Callable[[str, dict[str, str]], object] | None = None,
) -> Callable[[str], dict[str, str]]:
    """Build a ``fetch_one(journal) -> metrics`` callable for
    :func:`~scholarmind_spark.operators.enrich.fetch_metrics_df`.

    Request shape per journal_metrics.py:72-77 (``secretKey`` +
    ``publicationName``); any transport/parse error degrades to the empty
    shape like the reference's blanket except (journal_metrics.py:195-200).
    Rate limiting lives in ``fetch_metrics_df``, not here."""
    if metrics_column_mapping is None:
        metrics_column_mapping = {m: m for m in metrics_to_fetch}
    get = http_get or _default_http_get

    def fetch_one(journal_name: str) -> dict[str, str]:
        if not api_key or not metrics_to_fetch:
            return {}  # journal_metrics.py:59-66
        try:
            data = get(EASYSCHOLAR_URL, {"secretKey": api_key, "publicationName": journal_name})
            # parse INSIDE the boundary: a code-200 payload with a
            # malformed shape (select as a list, rankInfo as a scalar)
            # raised out of fetch_one and aborted the whole driver fetch
            # loop — the contract is degrade-to-empty, never an exception
            return parse_metrics_response(data, metrics_to_fetch, metrics_column_mapping)
        except Exception:
            return empty_metrics(metrics_to_fetch, metrics_column_mapping)

    # declared output columns, consumed by fetch_metrics_df's dynamic schema
    fetch_one.columns = [metrics_column_mapping.get(m, m) for m in metrics_to_fetch]
    return fetch_one
