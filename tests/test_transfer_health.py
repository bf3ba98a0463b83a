"""Processed-segment relocation (CommitLogTransfer parity) + health check."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from debezium_incubator_ray import gen
from debezium_incubator_ray import schema as S
from debezium_incubator_ray.config import EngineConfig
from debezium_incubator_ray.pipelines.cdc import CdcEngine

from tests.conftest import assert_tables_equal


def _spec(**kw):
    kw.setdefault("n_events", 400)
    kw.setdefault("n_initial", 80)
    kw.setdefault("seg_rows", 100)
    kw.setdefault("num_partitions", 4)
    kw.setdefault("seed", 11)
    return gen.BinlogSpec(**kw)


def _cfg(spec, **kw):
    kw.setdefault("num_partitions", spec.num_partitions)
    kw.setdefault("target_rows_per_file", 64)
    kw.setdefault("apply_concurrency", 2)
    return EngineConfig(**kw)


def test_archive_transfer_moves_done_segments(tmp_path):
    spec = _spec()
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    lake = str(tmp_path / "lake")
    eng = CdcEngine(
        lake, _cfg(spec, segment_transfer="archive"),
        payload_schema=S.pages_schema(),
    )
    eng.snapshot(gen.make_pages(spec.n_initial))
    eng.run(binlog)
    # every segment left the live layout and landed under _relocation/archive
    live = glob.glob(os.path.join(binlog, "p=*", "*.parquet"))
    assert live == []
    archived = glob.glob(
        os.path.join(binlog, "_relocation", "archive", "p=*", "*.parquet")
    )
    assert len(archived) > 0
    # final state is still the oracle state
    assert_tables_equal(
        eng.lake_table(), gen.oracle_final_state(spec, ev), sort_by="url"
    )
    # a fresh epoch over the emptied dir is a heartbeat, and the archived
    # files are NOT re-listed as new segments
    st = eng.apply_epoch(binlog)
    assert st["segments"] == 0 and st["events"] == 0


def test_delete_transfer_and_error_relocation(tmp_path):
    spec = _spec()
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    # corrupt one segment -> quarantine -> error folder (archive mode)
    segs = sorted(glob.glob(os.path.join(binlog, "p=*", "*.parquet")))
    with open(segs[0], "wb") as f:
        f.write(b"not a parquet file")
    lake = str(tmp_path / "lake")
    eng = CdcEngine(
        lake,
        _cfg(spec, segment_transfer="archive", aligned_binlog="never"),
        payload_schema=S.pages_schema(),
    )
    eng.snapshot(gen.make_pages(spec.n_initial))
    stats = eng.run(binlog)
    assert sum(s.get("quarantined", 0) for s in stats) == 1
    err = glob.glob(
        os.path.join(binlog, "_relocation", "error", "p=*", "*.parquet")
    )
    assert len(err) == 1
    assert not os.path.exists(segs[0])

    # delete mode: a second lake over a fresh copy leaves nothing behind
    binlog2 = str(tmp_path / "binlog2")
    gen.write_binlog(binlog2, spec, ev)
    lake2 = str(tmp_path / "lake2")
    eng2 = CdcEngine(
        lake2, _cfg(spec, segment_transfer="delete"),
        payload_schema=S.pages_schema(),
    )
    eng2.snapshot(gen.make_pages(spec.n_initial))
    eng2.run(binlog2)
    assert glob.glob(os.path.join(binlog2, "p=*", "*.parquet")) == []
    assert not os.path.isdir(os.path.join(binlog2, "_relocation"))
    assert_tables_equal(
        eng2.lake_table(), gen.oracle_final_state(spec, ev), sort_by="url"
    )


def test_transfer_only_after_flush_recorded(tmp_path):
    """The manifest that persisted must already list the moved segments —
    a reopened engine sees them done and never looks for the files."""
    spec = _spec()
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    lake = str(tmp_path / "lake")
    eng = CdcEngine(
        lake,
        _cfg(spec, segment_transfer="archive", offset_flush="periodic",
             offset_flush_interval_s=9999.0, offset_flush_max_events=10**9),
        payload_schema=S.pages_schema(),
    )
    eng.snapshot(gen.make_pages(spec.n_initial))
    eng.run(binlog)
    # periodic policy would have deferred the flush; transfer forced it
    reopened = CdcEngine(lake)
    moved = glob.glob(
        os.path.join(binlog, "_relocation", "archive", "p=*", "*.parquet")
    )
    done = set(reopened.manifest.doc["segments_done"])
    assert len(moved) > 0
    for f in moved:
        rel = os.path.relpath(
            f, os.path.join(binlog, "_relocation", "archive")
        )
        assert rel in done


def test_health_reports_checks(tmp_path):
    spec = _spec(n_events=200)
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    lake = str(tmp_path / "lake")
    eng = CdcEngine(lake, _cfg(spec), payload_schema=S.pages_schema())
    h0 = eng.health()
    assert h0["healthy"] and not h0["checks"]["snapshot-complete"]
    eng.snapshot(gen.make_pages(spec.n_initial))
    eng.run(binlog)
    h = eng.health()
    assert h["healthy"] and h["checks"] == {
        "manifest-current": True, "lake-files": True,
        "snapshot-complete": True,
    }
    # losing a committed run file flips lake-files and healthy
    victim = [
        f for f in eng.manifest.all_files()
        if os.path.exists(os.path.join(lake, f))
    ][0]
    os.rename(os.path.join(lake, victim), os.path.join(lake, victim) + ".gone")
    h2 = eng.health()
    assert not h2["healthy"] and not h2["checks"]["lake-files"]


def test_live_health_endpoint_during_tail(tmp_path, ray_session):
    """The HTTP endpoint the reference serves while streaming
    (CassandraConnectorTask.java:115-128): /ping /buildinfo /health
    /metrics answer DURING tail() with live manifest version, watermarks
    and epoch counters, and the server is torn down when tail returns."""
    import json
    import threading
    import time as _time
    import urllib.request

    spec = _spec()
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    lake = str(tmp_path / "lake")
    eng = CdcEngine(lake, _cfg(spec), payload_schema=S.pages_schema())
    eng.snapshot(gen.make_pages(spec.n_initial), snapshot_lsn=0)

    done = threading.Event()
    stop = threading.Event()
    stats: list = []

    def run_tail():
        # production shape: no idle cutoff, cancelled externally via stop
        stats.extend(eng.tail(binlog, poll_interval_s=0.2, idle_polls=None,
                              health_port=0, stop=stop))
        done.set()

    t = threading.Thread(target=run_tail)
    t.start()
    try:
        # wait for the server to come up, then poll it mid-tail
        deadline = _time.time() + 30
        while getattr(eng, "health_server", None) is None:
            assert _time.time() < deadline
            _time.sleep(0.01)
        port = eng.health_server.port

        def get(path):
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{path}", timeout=5
            ) as r:
                return r.read().decode()

        assert get("/ping") == "pong"
        assert json.loads(get("/buildinfo"))["engine"] == "debezium-incubator-ray"
        # poll until at least one epoch has been reported
        h = {}
        while _time.time() < deadline:
            h = json.loads(get("/health"))
            if h.get("epochs", 0) >= 1:
                break
            _time.sleep(0.05)
        assert h["status"] == "tailing" and h["snapshot_complete"]
        assert h["manifest_version"] >= 1
        # all cross-field consistency checks come from ONE /metrics read
        # (the tail keeps advancing epochs between requests)
        m = get("/metrics")
        assert "cdc_partition_watermark" in m
        lines = dict(
            l.rsplit(" ", 1) for l in m.strip().splitlines()
        )
        assert int(lines["cdc_events_read_total"]) == spec.n_events
        # applied = rows that actually merged (post in-batch LWW combine)
        # — strictly positive and never more than the deliveries read
        assert 0 < int(lines["cdc_events_applied_total"]) <= spec.n_events
        assert int(lines["cdc_epochs_total"]) >= 1
        assert int(lines["cdc_manifest_version"]) >= 1
        wm_lines = [l for l in m.splitlines() if l.startswith("cdc_partition_watermark")]
        assert len(wm_lines) == spec.num_partitions
    finally:
        stop.set()
        done.wait(timeout=120)
        t.join(timeout=120)

    assert sum(s.get("events", 0) for s in stats) == spec.n_events
    # torn down with the tail: the port no longer answers
    with pytest.raises(Exception):
        urllib.request.urlopen(f"http://127.0.0.1:{port}/ping", timeout=1)


def _self_signed_cert(tmp_path):
    """Generate a throwaway localhost cert/key pair (test-only TLS
    material) with the openssl CLI."""
    import subprocess

    cert = str(tmp_path / "health.crt")
    key = str(tmp_path / "health.key")
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", key, "-out", cert, "-days", "1", "-subj",
         "/CN=127.0.0.1", "-addext", "subjectAltName=IP:127.0.0.1"],
        check=True, capture_output=True,
    )
    return cert, key


def test_health_endpoint_over_tls(tmp_path):
    """TLS on the network surface (reference:
    cassandra/network/SslConfig.java + SslContextFactory.java build the
    connector's SslContext from configured cert/key paths): a
    cert/key-configured HealthServer answers every endpoint ONLY over
    https — the handshake is verified against the configured cert, and a
    plaintext request never gets a response."""
    import json
    import ssl
    import urllib.request

    from debezium_incubator_ray.state.health import HealthServer

    cert, key = _self_signed_cert(tmp_path)
    srv = HealthServer(port=0, ssl_certfile=cert, ssl_keyfile=key).start()
    try:
        assert srv.tls
        srv.update({"status": "ok", "manifest_version": 7,
                    "snapshot_complete": True, "epochs": 3})
        # VERIFYING client context: the handshake must chain to the
        # configured cert, not just "any TLS"
        ctx = ssl.create_default_context(cafile=cert)

        def get(path):
            with urllib.request.urlopen(
                f"https://127.0.0.1:{srv.port}{path}", timeout=5,
                context=ctx,
            ) as r:
                return r.read().decode()

        assert get("/ping") == "pong"
        h = json.loads(get("/health"))
        assert h["manifest_version"] == 7 and h["snapshot_complete"]
        assert "cdc_manifest_version 7" in get("/metrics")
        # plaintext on the same port: refused (TLS record layer rejects)
        with pytest.raises(Exception):
            urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/ping", timeout=2
            )
    finally:
        srv.stop()


def test_tail_serves_health_over_tls(tmp_path, ray_session):
    """The tail() plumbing for TLS: health_ssl=(cert, key) serves the
    live endpoint over https for the duration of the tail."""
    import json
    import ssl
    import urllib.request

    cert, key = _self_signed_cert(tmp_path)
    spec = _spec()
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    lake = str(tmp_path / "lake")
    eng = CdcEngine(lake, _cfg(spec), payload_schema=S.pages_schema())
    eng.snapshot(gen.make_pages(spec.n_initial), snapshot_lsn=0)

    import threading

    stop = threading.Event()
    stats: list = []

    def run_tail():
        stats.extend(eng.tail(binlog, poll_interval_s=0.2, idle_polls=None,
                              health_port=0, health_ssl=(cert, key),
                              stop=stop))

    t = threading.Thread(target=run_tail)
    t.start()
    try:
        import time as _time

        deadline = _time.time() + 30
        while getattr(eng, "health_server", None) is None:
            assert _time.time() < deadline
            _time.sleep(0.01)
        ctx = ssl.create_default_context(cafile=cert)
        h = {}
        while _time.time() < deadline:
            with urllib.request.urlopen(
                f"https://127.0.0.1:{eng.health_server.port}/health",
                timeout=5, context=ctx,
            ) as r:
                h = json.loads(r.read().decode())
            if h.get("epochs", 0) >= 1:
                break
            _time.sleep(0.05)
        assert h["status"] == "tailing" and h.get("epochs", 0) >= 1
    finally:
        stop.set()
        t.join(timeout=120)
    assert sum(s.get("events", 0) for s in stats) == spec.n_events


def test_tls_stalled_peer_does_not_wedge_accept_loop(tmp_path):
    """A TCP client that connects but never sends a ClientHello must not
    block the accept loop: the handshake is deferred to the handler
    thread, so other clients keep getting answers."""
    import socket
    import ssl
    import urllib.request

    from debezium_incubator_ray.state.health import HealthServer

    cert, key = _self_signed_cert(tmp_path)
    srv = HealthServer(port=0, ssl_certfile=cert, ssl_keyfile=key).start()
    try:
        stalled = socket.create_connection(("127.0.0.1", srv.port))
        try:
            ctx = ssl.create_default_context(cafile=cert)
            with urllib.request.urlopen(
                f"https://127.0.0.1:{srv.port}/ping", timeout=5,
                context=ctx,
            ) as r:
                assert r.read().decode() == "pong"
        finally:
            stalled.close()
    finally:
        srv.stop()
