"""SSTable-style per-run key Bloom sidecars (EngineConfig.bloom_filter_bits)
— the Cassandra point-read discipline for lookup(): negative lookups and
merge-on-read delta stacks skip runs that definitely lack every wanted key.
Kernel laws (no false negatives, bounded FPR), lookup equivalence with and
without blooms, vacuum retention of live sidecars, clone branching."""

import os

import numpy as np
import pyarrow as pa

from debezium_incubator_ray import gen
from debezium_incubator_ray import schema as S
from debezium_incubator_ray.config import EngineConfig
from debezium_incubator_ray.hashing import bloom_build, bloom_probe
from debezium_incubator_ray.pipelines.cdc import CdcEngine

from tests.conftest import assert_tables_equal


def test_kernel_no_false_negatives_and_bounded_fpr():
    rng = np.random.default_rng(4)
    present = pa.array(rng.choice(10**9, 5000, replace=False).astype(np.int64))
    bits_log2 = int(np.ceil(np.log2(5000 * 10)))
    words = bloom_build(present, bits_log2)
    assert bloom_probe(words, present, bits_log2).all()  # never miss
    absent = pa.array((np.arange(20000) + 2 * 10**9).astype(np.int64))
    fpr = bloom_probe(words, absent, bits_log2).mean()
    assert fpr < 0.05, fpr
    # string keys too
    sp = pa.array([f"https://x.example/{i}" for i in range(2000)])
    w2 = bloom_build(sp, 15)
    assert bloom_probe(w2, sp, 15).all()


def _lakes(tmp_path, **cfg_kw):
    spec = gen.BinlogSpec(
        n_events=500, n_initial=120, seg_rows=125, num_partitions=4, seed=3
    )
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    engines = []
    for tag, bloom in (("plain", 0), ("bloom", 10)):
        cfg = EngineConfig(
            num_partitions=4, target_rows_per_file=64, apply_concurrency=2,
            bloom_filter_bits=bloom, **cfg_kw,
        )
        eng = CdcEngine(str(tmp_path / f"lake-{tag}"), cfg,
                        payload_schema=S.pages_schema())
        eng.snapshot(gen.make_pages(spec.n_initial), snapshot_lsn=0)
        eng.run(binlog)
        engines.append(eng)
    return engines


def test_lookup_equivalence_and_sidecars(tmp_path):
    plain, bloom = _lakes(tmp_path)
    # every run entry carries the bloom flag and its sidecar exists
    n_runs = 0
    for p in range(4):
        for f in bloom.manifest.files(p):
            assert f.get("bloom") and len(f["bloom"]) == 2
            assert os.path.exists(
                os.path.join(bloom.lake_dir, f["path"] + ".bloom")
            )
            n_runs += 1
    assert n_runs > 0
    live = sorted(set(plain.lake_table()["url"].to_pylist()))
    probe = live[::7] + ["https://missing.example/a", "https://missing.example/b"]
    a = plain.lookup(probe)
    b = bloom.lookup(probe)
    assert_tables_equal(b, a, sort_by="url")
    assert a.num_rows == len(live[::7])


def test_negative_lookup_skips_reads(tmp_path, monkeypatch):
    _, bloom = _lakes(tmp_path)
    import debezium_incubator_ray.pipelines.cdc as cdc_mod

    calls = {"n": 0}
    real = cdc_mod.pq.read_table

    def counting(path, *a, **kw):
        calls["n"] += 1
        return real(path, *a, **kw)

    monkeypatch.setattr(cdc_mod.pq, "read_table", counting)
    out = bloom.lookup([f"https://definitely-missing.example/{i}"
                        for i in range(50)])
    assert out.num_rows == 0
    # without blooms every covering run would be read; with them, (almost)
    # none are — allow a couple of false-positive reads
    assert calls["n"] <= 2, calls["n"]


def test_mor_deltas_vacuum_and_clone_keep_blooms(tmp_path):
    spec = gen.BinlogSpec(
        n_events=400, n_initial=80, seg_rows=100, num_partitions=4, seed=6
    )
    ev = gen.gen_events(spec)
    binlog = str(tmp_path / "binlog")
    gen.write_binlog(binlog, spec, ev)
    cfg = EngineConfig(
        num_partitions=4, target_rows_per_file=64, apply_concurrency=2,
        bloom_filter_bits=10, sink_mode="mor", mor_compact_deltas=0,
    )
    eng = CdcEngine(str(tmp_path / "lake"), cfg, payload_schema=S.pages_schema())
    eng.snapshot(gen.make_pages(spec.n_initial), snapshot_lsn=0)
    eng.run(binlog)
    deltas = [f for p in range(4) for f in eng.manifest.deltas(p)]
    assert deltas and all(f.get("bloom") for f in deltas)
    live = sorted(set(eng.lake_table()["url"].to_pylist()))
    before = eng.lookup(live[:5])
    # compaction + vacuum: superseded sidecars go, live ones stay
    eng.compact()
    eng.flush()
    st = eng.vacuum(keep_versions=1)
    assert st["removed_files"] > 0
    for p in range(4):
        for f in eng.manifest.files(p):
            assert os.path.exists(
                os.path.join(eng.lake_dir, f["path"] + ".bloom")
            )
    assert_tables_equal(eng.lookup(live[:5]), before, sort_by="url")
    # clone carries the sidecars (hardlinked) and its lookups skip too
    c = eng.clone(str(tmp_path / "branch"))
    assert_tables_equal(c.lookup(live[:5]), before, sort_by="url")
    for p in range(4):
        for f in c.manifest.files(p):
            assert os.path.exists(
                os.path.join(c.lake_dir, f["path"] + ".bloom")
            )


def test_reopen_restores_bloom_policy(tmp_path):
    _, bloom = _lakes(tmp_path)
    bloom.flush()
    bloom.close()
    eng2 = CdcEngine(bloom.lake_dir)
    assert eng2.cfg.bloom_filter_bits == 10
