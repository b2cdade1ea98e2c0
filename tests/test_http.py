"""HTTP service surface (http.py): the reference's management-over-HTTP
contract (/root/reference/src/api.cr:25-90 / OPENAPI_DOC.yml:8-55) driven
end-to-end — reindex, backfill, ready/health, version, plus engine-native
query/phrase — through the stdlib client in client.HttpClient."""

import os
import threading
import time

import pytest

from search_ingest_ray.client import HttpClient
from search_ingest_ray.http import make_server
from search_ingest_ray.pipelines.manager import ManagedTable, TableManager
from search_ingest_ray.util import doc_id_hash


@pytest.fixture
def http_service(ray_session, tmp_path, corpus_dir):
    kw = dict(html_col="html", chunk_files=2, num_term_partitions=2,
              store_fields=["url"])
    mgr = TableManager(str(tmp_path / "base"),
                       [ManagedTable("pages", corpus_dir, kw)])
    srv, svc = make_server(mgr)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    host, port = srv.server_address[:2]
    try:
        yield HttpClient(f"http://{host}:{port}"), mgr, svc
    finally:
        srv.shutdown()


def test_lifecycle_over_http(http_service):
    cli, mgr, svc = http_service
    # before any backfill: not ready, health says loading (api.cr:73-76)
    assert not cli.ready()
    assert cli.healthcheck()          # loading returns early with 200
    v = cli.version()
    assert v["service"] == "search-ingest-ray" and v["version"]

    # POST /backfill builds every managed table
    assert cli.backfill()
    assert cli.ready()
    assert mgr.health()["pages"]["healthy"]

    # engine-native query over HTTP
    r = cli.query("pages", "straße", k=5, fields=["url"])
    assert r["ok"] and len(r["hits"]) > 0
    assert all("url" in h for h in r["hits"])

    # filters ride through (FieldStore grammar, JSON-normalized)
    first_url = r["hits"][0]["url"]
    rf = cli.query("pages", "straße", k=5, filters={"url": first_url})
    assert rf["ok"]
    assert {h["doc_id"] for h in rf["hits"]} == {doc_id_hash(first_url)}

    # POST /reindex?backfill=true: drop + rebuild, still queryable
    assert cli.reindex(backfill=True)
    r2 = cli.query("pages", "straße", k=5)
    assert r2["ok"] and [h["doc_id"] for h in r2["hits"]] == \
        [h["doc_id"] for h in r["hits"]]

    # unknown table → 404, unknown route → 404
    assert cli.query("nope", "x")["error"]
    assert cli._req("GET", "/bogus")[0] == 404


def test_health_recovery_spawns_heal(http_service):
    cli, mgr, svc = http_service
    cli.backfill()
    assert cli.healthcheck()
    # break the table: health goes 500 and the failure latches (api.cr:83-89)
    import shutil
    shutil.rmtree(os.path.join(mgr.index_root("pages"), "epochs"))
    assert not cli.healthcheck()
    assert svc.failed_healthcheck
    # restore health out-of-band; first healthy check clears the latch and
    # heals asynchronously (the reference's failed→healed auto-backfill)
    mgr.backfill_all()
    assert cli.healthcheck()
    for _ in range(100):
        if not svc.failed_healthcheck:
            break
        time.sleep(0.05)
    assert not svc.failed_healthcheck
    assert cli.query("pages", "straße", k=3)["ok"]
