"""Simulated 2-node cluster driver for the objref exchange (run by
tests/test_multinode.py in its own process: it owns a ray.cluster_utils
Cluster, which cannot share the pytest session's local Ray).

Proves the three multi-node laws of EngineConfig.exchange="objref":
  1. an epoch over a misaligned binlog completes on a 2-node cluster with
     the final lake byte-equal to the engine-independent oracle (and no
     shared staging root is ever created under the lake);
  2. stage-1 slice objects live ONLY on the node that produced them
     (per-node staging — checked via ray.experimental.get_object_locations
     on >object-inline-threshold slices pinned to each node);
  3. a consumer pinned to the OTHER node reads those slices through the
     object store (cross-node fetch needs no shared filesystem).

Prints MULTINODE_OK as the success sentinel.
"""
import os
import sys

import numpy as np
import pyarrow as pa
import ray
from ray.cluster_utils import Cluster

from debezium_incubator_ray import gen, schema as S
from debezium_incubator_ray.config import EngineConfig
from debezium_incubator_ray.pipelines.cdc import CdcEngine
from debezium_incubator_ray.stages import exchange as X

root = sys.argv[1]

cluster = Cluster(
    initialize_head=True,
    head_node_args={"num_cpus": 2, "resources": {"nodeA": 100},
                    "include_dashboard": False},
)
cluster.add_node(num_cpus=2, resources={"nodeB": 100})
ray.init(address=cluster.address, logging_level="ERROR")
try:
    node_id_of = {}
    for n in ray.nodes():
        for marker in ("nodeA", "nodeB"):
            if marker in n.get("Resources", {}):
                node_id_of[marker] = n["NodeID"]
    assert len(node_id_of) == 2, node_id_of

    # --- law 1: whole-engine epoch on the 2-node cluster ----------------
    spec = gen.BinlogSpec(n_events=3000, n_initial=600, num_partitions=4,
                          seg_rows=512, seed=11)
    binlog = os.path.join(root, "binlog")
    out = gen.write_binlog(binlog, spec)
    oracle = gen.oracle_final_state(spec, out["events"])
    lake = os.path.join(root, "lake")
    eng = CdcEngine(
        lake,
        EngineConfig(num_partitions=8, exchange="objref",
                     aligned_binlog="never", apply_num_cpus=1),
        payload_schema=S.pages_schema(),
    )
    eng.snapshot(gen.make_pages(spec.n_initial))
    stats = eng.run(binlog)
    assert stats and all(not s.get("aligned") for s in stats), stats
    lt = eng.lake_table().sort_by([("url", "ascending")])
    assert lt.num_rows == oracle.num_rows, (lt.num_rows, oracle.num_rows)
    for col in oracle.column_names:
        assert lt[col].combine_chunks().equals(
            oracle[col].combine_chunks()), f"column {col}"
    # objref mode must not have created the shared staging root
    assert not os.path.exists(os.path.join(lake, "_staging"))
    # replay no-op still holds across nodes
    assert sum(s.get("applied", 0) for s in eng.run(binlog)) == 0

    # --- law 2: staged bytes stay on the writing node -------------------
    # slices must exceed Ray's ~100 KiB inline threshold or they'd live in
    # the owner (driver) process instead of the writer node's plasma store
    P = 4
    rng = np.random.default_rng(0)

    def block(seed):
        r = np.random.default_rng(seed)
        n = 400_000  # ~3.2 MB of incompressible int64 -> ~800 KB/slice
        return pa.table({
            S.PART: pa.array((np.arange(n) % P).astype(np.int32)),
            "v": r.integers(0, 2**62, n),
        })

    refs = {}
    for marker in ("nodeA", "nodeB"):
        refs[marker] = X.split_block.options(
            num_returns=P + 1, resources={marker: 1}
        ).remote(block(hash(marker) % 2**31), P)
    metas = {m: ray.get(r[0]) for m, r in refs.items()}
    for m, (cts, node_id) in metas.items():
        assert sum(cts) == 400_000, cts
        # the split's self-reported producing node matches reality
        assert node_id == node_id_of[m], (m, node_id, node_id_of)
    locs = ray.experimental.get_object_locations(
        [r for m in refs for r in refs[m][1:]]
    )
    for marker, r in refs.items():
        for sl in r[1:]:
            node_ids = locs[sl]["node_ids"]
            assert node_ids == [node_id_of[marker]], (
                marker, node_ids, node_id_of)

    # --- law 3: cross-node fetch through the object store ---------------
    @ray.remote(resources={"nodeB": 1})
    def consume(*payloads):
        tables = [X._ipc_bytes_to_table(b) for b in payloads if b is not None]
        return sum(t.num_rows for t in tables)

    got = ray.get(consume.remote(*refs["nodeA"][1:]))
    assert got == 400_000, got

    # --- law 4: the DEMUX (multi-table) objref epoch across nodes -------
    # route one pages stream into two tables by url parity; byte-equal to
    # a staging-mode run over the same input, still no shared staging root
    from debezium_incubator_ray.pipelines.lake import Lake
    from debezium_incubator_ray.stages.normalize import NormalizeEnvelope  # noqa: F401

    spec2 = gen.BinlogSpec(n_events=2000, n_initial=0, num_partitions=4,
                           seg_rows=512, seed=23, emit_before=False)
    binlog2 = os.path.join(root, "binlog2")
    gen.write_binlog(binlog2, spec2, gen.gen_events(spec2))

    def route(t):
        import pyarrow.compute as pc

        src = t["source"].combine_chunks()
        after = t["after"].combine_chunks()
        url = after.field("url")
        # last digit's parity (urls end in the zero-padded id); deletes
        # have a null after -> null route -> no table (both modes agree)
        last = pc.extract_regex(url, r"(?P<d>\d)$")
        parity = pc.bit_wise_and(
            pc.cast(pc.struct_field(last, "d"), pa.int64()), 1)
        tbl = pc.if_else(pc.equal(parity, 0),
                         pa.scalar("pages_even"), pa.scalar("pages_odd"))
        names = [src.type.field(i).name for i in range(src.type.num_fields)]
        if isinstance(tbl, pa.ChunkedArray):
            tbl = tbl.combine_chunks()
        arrs = [tbl if n == "table" else src.field(i)
                for i, n in enumerate(names)]
        new_src = pa.StructArray.from_arrays(arrs, names=names)
        i = t.schema.get_field_index("source")
        return t.set_column(i, t.schema.field("source"), new_src)

    results = {}
    for mode in ("staging", "objref"):
        lk = Lake(os.path.join(root, f"dlake-{mode}"))
        for name in ("pages_even", "pages_odd"):
            lk.create_table(name, S.pages_schema(), EngineConfig(
                num_partitions=4, exchange=mode, apply_num_cpus=1))
        st = lk.apply_epoch_demux(binlog2, route_fn=route)
        assert st["events"] > 0, (mode, st)
        results[mode] = {
            n: lk[n].lake_table().sort_by([("url", "ascending")])
            for n in ("pages_even", "pages_odd")
        }
        if mode == "objref":
            assert not os.path.exists(
                os.path.join(root, f"dlake-{mode}", "_staging"))
    for n in ("pages_even", "pages_odd"):
        assert results["staging"][n].equals(results["objref"][n]), n

    print("MULTINODE_OK")
finally:
    ray.shutdown()
    cluster.shutdown()
