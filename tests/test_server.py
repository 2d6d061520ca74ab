"""HTTP entry-point tests: POST /query must serve BrokerResponse-shaped
JSON for selection, scalar and grouped aggregation PQL, report errors
in-band, and 404 unknown paths."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from realtime_olap_spark.server import PQLServer
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def server(spark):
    srv = PQLServer(spark, SF_DIR).start()
    yield srv
    srv.stop()


def _post(server: PQLServer, body, path: str = "/query"):
    data = (json.dumps(body) if isinstance(body, dict) else body).encode()
    req = urllib.request.Request(
        f"http://{server.host}:{server.port}{path}", data=data,
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def test_post_query_selection(server):
    status, resp = _post(server, {
        "pql": "SELECT o_orderkey, o_totalprice FROM orders "
               "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 5"})
    assert status == 200
    assert resp["exceptions"] == []
    assert resp["selectionResults"]["columns"] == ["o_orderkey", "o_totalprice"]
    assert len(resp["selectionResults"]["results"]) == 5
    assert resp["numDocsScanned"] is not None and "timeUsedMs" in resp


def test_post_query_grouped_aggregation(server):
    status, resp = _post(server, {
        "pql": "SELECT l_returnflag, count(*), sum(l_quantity) "
               "FROM lineitem GROUP BY l_returnflag TOP 2"})
    assert status == 200
    results = resp["aggregationResults"]
    assert [r["function"] for r in results] == ["count_star", "sum_l_quantity"]
    for r in results:
        assert r["groupByColumns"] == ["l_returnflag"]
        assert 0 < len(r["groupByResult"]) <= 2
        vals = [g["value"] for g in r["groupByResult"]]
        assert vals == sorted(vals, reverse=True)  # per-function desc order


def test_post_query_raw_body(server):
    status, resp = _post(server, "SELECT count(*) FROM orders")
    assert status == 200
    assert resp["aggregationResults"][0]["function"] == "count_star"


def test_post_query_error_in_band(server):
    status, resp = _post(server, {"pql": "SELECT FROM nowhere"})
    assert status == 200  # broker reports errors in-band
    assert resp["exceptions"] and resp["exceptions"][0]["errorCode"] == 150


def test_post_unknown_path_404(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, {"pql": "SELECT count(*) FROM orders"}, path="/nope")
    assert e.value.code == 404


# ---------------------------------------------------------------------------
# Broker deadline: per-query timeout with in-band TIMEOUT exception
# ---------------------------------------------------------------------------

def test_engine_query_timeout_and_recovery(spark):
    import pytest as _pytest

    from realtime_olap_spark.plans.pql import PQLEngine, QueryTimeout

    eng = PQLEngine(spark, "/root/testdata/sf0.1")
    heavy = ("SELECT distinctcount(l_partkey), distinctcount(l_orderkey), "
             "count(*) FROM lineitem GROUP BY l_suppkey TOP 100")
    with _pytest.raises(QueryTimeout):
        eng.execute(heavy, timeout_ms=30)
    # the session survives a cancelled group: same query, sane deadline
    ok = eng.execute(heavy, timeout_ms=120_000)
    assert ok["aggregationResults"]


def test_server_timeout_in_band(spark):
    import json as _json
    import urllib.request

    from realtime_olap_spark.server import PQLServer

    srv = PQLServer(spark, "/root/testdata/sf0.1").start()
    try:
        body = _json.dumps({
            "pql": ("SELECT distinctcount(l_partkey), distinctcount(l_orderkey),"
                    " count(*) FROM lineitem GROUP BY l_suppkey TOP 100"),
            "timeoutMs": 30}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/query", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            resp = _json.loads(r.read())
        assert resp["exceptions"] and resp["exceptions"][0]["errorCode"] == 250
    finally:
        srv.stop()
