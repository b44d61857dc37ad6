#!/usr/bin/env python3
"""Build the synthetic scale-ladder rungs used by NOTES.md's round-7
scaling measurements (driver-side tooling, like compare.py — the
library itself never depends on this).

Replicates sf0.1's `documents` and `embeddings` tables 3x and 10x with
per-replica DETERMINISTIC transforms chosen so each replica keeps its
own internal duplicate/similarity structure while sharing none with
the others — a bigger crawl's shape, not an all-duplicates pathology:

  documents:  per-replica bijective lowercase-alphabet rotation
              (replica r's shingle sets are disjoint from replica 0's;
              verified zero shared 8-gram shingles between replicas
              of the same doc)
  embeddings: per-replica sign flips on dimensions selected by the
              replica index's bits (a diagonal +/-1 transform, so
              in-replica cosines are preserved EXACTLY; the same
              vector under two replicas lands at cos ~0.4)
  events:     per-replica +400-day timestamp shift with offset
              user/event ids — the longer-retention scaling shape:
              each replica keeps its own temporal structure (as-of
              matches, windows, funnels) and interacts with no other.
              Written as TIMESTAMP_NS to match the fixture's physical
              type (Spark reads it via nanosAsLong).

Usage:
  python3 tools/gen_scale_rungs.py [--src /root/testdata/sf0.1] \
      [--out /tmp/graft_scale_root]

Then time any documents/embeddings-only query per rung:
  SPARK_GRAFT_SF_DIR=<out>/docs/x10 SPARK_GRAFT_ITERS=1 \
      SPARK_GRAFT_QUERIES=q41_simhash_hamming sbt "runMain graft.Bench"
"""
import argparse
import os

import duckdb

ALPHA = "abcdefghijklmnopqrstuvwxyz"

# Multipliers coprime to 26: affine maps i -> a*i + b (mod 26) are
# bijections, giving 12*26 = 312 distinct per-replica permutations.
# For r < 26 the map degenerates to the plain rotation (a=1, b=r), so
# x3/x10 rungs are byte-identical to the round-7 ones.
COPRIME_A = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]


_MAX_ID_CACHE = {}


def needs_bigint(src, table, idcol, reps, step=10_000_000):
    """True when the largest replicated id, (reps-1)*step + max(idcol),
    exceeds INT32 range. Gating on the ACTUAL maximum (not reps alone —
    the old `reps > 214` gate ignored the base-id term and under-cast
    for reps ~172-214 with large base ids; round-13 ADVICE) keeps the
    recorded small-rung manifests byte-identical while making deep
    ladders safe regardless of the fixture's id range. DuckDB errors
    loudly on overflow rather than corrupting, so a miss here is a
    build failure, not bad data — but the build should not fail."""
    key = (src, table, idcol)
    if key not in _MAX_ID_CACHE:  # fixture is immutable within a run
        _MAX_ID_CACHE[key] = int(duckdb.sql(
            f"SELECT max({idcol}) FROM read_parquet('{src}/{table}.parquet')"
        ).fetchone()[0])
    return (reps - 1) * step + _MAX_ID_CACHE[key] > 2**31 - 1


def doc_perm(r):
    a = COPRIME_A[(r // 26) % len(COPRIME_A)]
    b = r % 26
    return "".join(ALPHA[(a * i + b) % 26] for i in range(26))


def doc_arms(src, reps):
    # Deep ladders cast the id to BIGINT so the replica offset cannot
    # overflow an INT32-typed fixture column. Gated on the actual
    # maximum replicated id (needs_bigint) so the x3..x100 manifests
    # (and thus the recorded-ladder rung bytes) stay untouched.
    idexpr = ("CAST(doc_id AS BIGINT)"
              if needs_bigint(src, "documents", "doc_id", reps)
              else "doc_id")
    arms = []
    for r in range(reps):
        rot = doc_perm(r)
        arms.append(f"""
          SELECT {idexpr} + {r * 10000000} AS doc_id,
                 translate(text, '{ALPHA}', '{rot}') AS text,
                 * EXCLUDE (doc_id, text)
          FROM read_parquet('{src}/documents.parquet')""")
    return " UNION ALL ".join(arms)


def emb_arms(src, reps, cycle=4):
    # cycle = how many bits of the replica index select sign-flip
    # dimensions; the pattern repeats with period 2^cycle, so reps > 16
    # must pass cycle=5 or two replicas become EXACT copies (cos 1.0 —
    # an all-duplicates pathology, not a bigger corpus). cycle=4 is
    # kept as the default so x3/x10 stay byte-identical to the round-7
    # rungs the recorded ladder numbers came from.
    assert reps <= 2 ** cycle, f"reps {reps} exceeds 2^{cycle} patterns"
    # Deep ladders cast the id to BIGINT so the replica offset cannot
    # overflow an INT32-typed fixture column; gated on the actual
    # maximum replicated id (needs_bigint) so the x3..x100 manifests
    # (recorded-ladder rung bytes) stay untouched.
    idexpr = ("CAST(vec_id AS BIGINT)"
              if needs_bigint(src, "embeddings", "vec_id", reps)
              else "vec_id")
    arms = []
    for r in range(reps):
        arms.append(f"""
          SELECT {idexpr} + {r * 10000000} AS vec_id,
            [CASE WHEN ({r} // CAST(pow(2, (i-1) % {cycle}) AS INTEGER)) % 2 = 1
                  THEN CAST(-embedding[i] AS FLOAT)
                  ELSE embedding[i] END
             for i in range(1, len(embedding)+1)] AS embedding,
            label
          FROM read_parquet('{src}/embeddings.parquet')""")
    return " UNION ALL ".join(arms)


def emb_arms_perm(src, reps, dim=64):
    # Round-13 replacement transform for deep embedding rungs: the
    # sign-flip-only scheme is BROKEN for replica pairs whose flip
    # patterns differ in one index bit — only ~dim/cycle dims flip, so
    # the same base vector lands at cos ~0.75 across the pair, and
    # measured on the x300 rung 6.5% of those pairs exceed the 0.9
    # near-dup threshold (131/2000 at replicas 0<->1) while the rest
    # flood LSH buckets as near-threshold impostors. Per-replica
    # verified-pair density grew 1,895 (x30) -> 2,528 (x100) -> 4,773
    # (x300): a duplicate-density gradient, not a bigger corpus.
    # Fix: a per-replica random PERMUTATION of dimensions composed with
    # a per-replica random sign pattern (both orthogonal maps, so
    # in-replica cosines are still preserved EXACTLY). Cross-replica
    # cosine is then a +/-1-weighted permuted self-overlap, typically
    # |cos| ~ 1/sqrt(dim); no pattern-adjacency structure exists.
    # Replica 0 stays the identity so the x1 slice is the base table.
    # Seeded Mersenne-Twister keeps rungs deterministic across runs.
    import random
    arms = []
    idexpr = ("CAST(vec_id AS BIGINT)"
              if needs_bigint(src, "embeddings", "vec_id", reps)
              else "vec_id")
    for r in range(reps):
        rnd = random.Random(1013 * r)
        perm = list(range(1, dim + 1))
        signs = [1] * dim
        if r > 0:
            rnd.shuffle(perm)
            signs = [rnd.choice((1, -1)) for _ in range(dim)]
        elems = ", ".join(
            (f"embedding[{p}]" if s == 1
             else f"CAST(-embedding[{p}] AS FLOAT)")
            for p, s in zip(perm, signs))
        arms.append(f"""
          SELECT {idexpr} + {r * 10000000} AS vec_id,
                 [{elems}] AS embedding,
                 label
          FROM read_parquet('{src}/embeddings.parquet')""")
    return " UNION ALL ".join(arms)


def event_arms(src, reps):
    # same actual-max overflow gate as doc/emb arms (event offsets are
    # 10x larger, so an INT32-typed fixture would overflow by ~x21)
    eid = ("CAST(event_id AS BIGINT)"
           if needs_bigint(src, "events", "event_id", reps,
                           step=100_000_000)
           else "event_id")
    uid = ("CAST(user_id AS BIGINT)"
           if needs_bigint(src, "events", "user_id", reps)
           else "user_id")
    arms = []
    for r in range(reps):
        arms.append(f"""
          SELECT {eid} + {r * 100000000} AS event_id,
                 CAST(ts + INTERVAL ({r}*400) DAYS AS TIMESTAMP_NS) AS ts,
                 {uid} + {r * 10000000} AS user_id,
                 event_type, value, props
          FROM read_parquet('{src}/events.parquet')""")
    return " UNION ALL ".join(arms)


def graph_arms(src, reps, offset=1000000):
    # lineitem's (l_partkey, l_suppkey) pair graph, replicated into
    # DISJOINT id spaces (offsets stay under the 10^7 dst shift q90/q92
    # apply, so src/dst ranges never collide): each replica is its own
    # connected region — a bigger catalog's shape, not a denser graph.
    # (reps-1)*offset + max_key must stay < 10^7: the default offset
    # holds through reps=10; larger ladders must pass a smaller one
    # (still > max l_partkey ~20k, keeping replicas disjoint).
    assert (reps - 1) * offset + 300000 < 10**7, "ids cross the dst shift"
    arms = []
    for r in range(reps):
        arms.append(f"""
          SELECT l_partkey + {r}*{offset} AS l_partkey,
                 l_suppkey + {r}*{offset} AS l_suppkey
          FROM read_parquet('{src}/lineitem.parquet')""")
    return " UNION ALL ".join(arms)


def graphco_arms(src, reps, offset=10_000_000):
    # (l_orderkey, l_partkey) projection for the CO-ORDER graph ops
    # (q146 triangles, q152 k-core): replicas in disjoint id spaces on
    # BOTH columns, so each replica forms its own co-order component —
    # a bigger catalog's shape, not a denser graph. orderkey max at
    # sf0.1 is ~6e5 and partkey ~2e4; the offsets keep x30 well inside
    # INT32 (29*1e7 + 6e5 < 2^31).
    arms = []
    for r in range(reps):
        arms.append(f"""
          SELECT l_orderkey + {r}*{offset} AS l_orderkey,
                 l_partkey + {r}*{offset // 10} AS l_partkey
          FROM read_parquet('{src}/lineitem.parquet')""")
    return " UNION ALL ".join(arms)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/graft_scale_root")
    ap.add_argument("--force", action="store_true",
                    help="regenerate rungs that already exist")
    ap.add_argument("--families", default="docs,emb,events,graph,graphco",
                    help="comma list of rung families to (re)generate "
                         "(docs, emb, events, graph) — deep-rung reruns "
                         "usually need one family, and the unrequested "
                         "ones (emb x3000assign, events x100) are the "
                         "expensive ones")
    args = ap.parse_args()
    families = set(args.families.split(","))

    con = duckdb.connect()

    def copy(arms, d, table):
        # family filter: the rung's family is its directory under --out
        fam = os.path.relpath(d, args.out).split(os.sep)[0]
        if fam not in families:
            return
        # The skip is keyed on a .sql manifest of the generating query:
        # after a generator change (emb cycle, graph offset, ...) a
        # stale rung is REGENERATED instead of silently reused feeding
        # scale measurements (round-10 advice).
        os.makedirs(d, exist_ok=True)
        dst = os.path.join(d, f"{table}.parquet")
        man = dst + ".sql"
        if os.path.exists(dst) and not args.force:
            prev = open(man).read() if os.path.exists(man) else None
            if prev == arms:
                print(f"{dst}: exists, generator SQL unchanged, "
                      f"skipped (--force to regenerate)")
                return
            why = "manifest missing" if prev is None else "generator SQL CHANGED"
            print(f"{dst}: exists but {why} — regenerating")
        con.execute(f"COPY ({arms}) TO '{dst}' (FORMAT PARQUET)")
        with open(man, "w") as f:
            f.write(arms)
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"{dst}: {n} rows")
    # graphco x3/x10/x30/x100: the co-order-graph rungs (orderkey+
    # partkey — the plain graph family drops orderkey) for q146/q152-
    # shaped ops; x100 added round 15 for the q166/q172 ladders
    # (99*1e7 + 6e5 < 2^31, so the INT32 columns hold)
    for name, reps in [("x3", 3), ("x10", 10), ("x30", 30), ("x100", 100)]:
        copy(graphco_arms(args.src, reps),
             os.path.join(args.out, "graphco", name), "lineitem")
    # x30/x100 are documents-only (the round-8 dedup deep-ladder rungs);
    # the affine permutations keep replica shingle spaces disjoint.
    for name, reps in [("x3", 3), ("x10", 10)]:
        for kind, arms in [("docs", doc_arms(args.src, reps)),
                           ("emb", emb_arms(args.src, reps)),
                           ("events", event_arms(args.src, reps)),
                           ("graph", graph_arms(args.src, reps))]:
            table = {"docs": "documents", "emb": "embeddings",
                     "events": "events", "graph": "lineitem"}[kind]
            copy(arms, os.path.join(args.out, kind, name), table)
    # docs x300 (round-12: the dedup family's 3x extrapolation check —
    # 1.5M docs; 300 replicas fit the 312 distinct affine permutations)
    for name, reps in [("x30", 30), ("x100", 100), ("x300", 300)]:
        copy(doc_arms(args.src, reps),
             os.path.join(args.out, "docs", name), "documents")
    # embeddings x30 (the Sizing.Auto knee-proof rung): needs the
    # 5-bit sign-flip cycle — see emb_arms
    copy(emb_arms(args.src, 30, cycle=5),
         os.path.join(args.out, "emb", "x30"), "embeddings")
    # embeddings x100 (round-10: the embedding-family deep rung —
    # ~200k vectors): 7-bit cycle keeps all 100 replica sign patterns
    # distinct (2^7 >= 100)
    copy(emb_arms(args.src, 100, cycle=7),
         os.path.join(args.out, "emb", "x100"), "embeddings")
    # embeddings x300 (round-12: one rung past the in-group-verify
    # x100 measurement — ~600k vectors; the exponent band's 3x
    # extrapolation check): 9-bit cycle keeps all 300 replica sign
    # patterns distinct (2^9 >= 300)
    copy(emb_arms(args.src, 300, cycle=9),
         os.path.join(args.out, "emb", "x300"), "embeddings")
    # permuted-transform embedding rungs (round-13): the ladder rungs
    # the deep-scale measurements should use — see emb_arms_perm for
    # why the sign-flip-only x30/x100/x300 rungs carry a duplicate-
    # density gradient. Kept under new names; the old rungs stay so
    # the recorded round-10/12 ladder entries remain reproducible.
    for name, reps in [("x30p", 30), ("x100p", 100), ("x300p", 300)]:
        copy(emb_arms_perm(args.src, reps),
             os.path.join(args.out, "emb", name), "embeddings")
    # embeddings x3000 ASSIGN corpus (round-13): the tier-2 IVF scan's
    # organic engagement needs auto nlist >= 9216 -> 4*sqrt(n) -> n >=
    # 5.3M rows — no near-dup rung reaches that. Assignment cost is
    # per-row and independent of duplicate structure, so this rung is
    # the x300 table replicated 10x with BIGINT id offsets ONLY (no
    # vector transform): fine for timing the coarse-assignment scan,
    # NOT a near-dup/semdedup corpus (each vector appears 10x).
    x300 = os.path.join(args.out, "emb", "x300", "embeddings.parquet")
    # offset 1e11: clear of the x300 id range (max 2.99e9) AND of the
    # probes' +1e10 planted-copy offset, so even a misuse of this rung
    # by a planting probe cannot re-create the round-11 id-collision
    # fan-out
    assign_arms = " UNION ALL ".join(
        f"""
          SELECT vec_id + {r * 100000000000} AS vec_id, embedding, label
          FROM read_parquet('{x300}')""" for r in range(10))
    copy(assign_arms,
         os.path.join(args.out, "emb", "x3000assign"), "embeddings")
    # events/graph x30 (round-9 one-rung-up extensions; same transforms
    # as their x3/x10 rungs — offsets stay collision-free at reps=30)
    copy(event_arms(args.src, 30),
         os.path.join(args.out, "events", "x30"), "events")
    # events x100 (round-10): ~100M events; Python-literal offsets
    # (r*1e8 up to 9.9e9) are BIGINTs in the generated SQL, and the
    # +400-day-per-replica shift tops out at ~108 years — inside
    # timestamp range
    copy(event_arms(args.src, 100),
         os.path.join(args.out, "events", "x100"), "events")
    copy(graph_arms(args.src, 30, offset=300000),
         os.path.join(args.out, "graph", "x30"), "lineitem")
    # graph x100 (round-10: the rung that crosses the 2M-node broadcast
    # gate ORGANICALLY — ~2.1M nodes, ~60M edge rows): offset shrinks
    # so 99 replica shifts stay under the 10^7 dst shift while
    # remaining > max l_partkey (~20k at sf0.1), keeping replicas
    # disjoint.
    copy(graph_arms(args.src, 100, offset=97000),
         os.path.join(args.out, "graph", "x100"), "lineitem")
    # graph x300 (round-12: one rung past the x100 gate-crossing —
    # ~6.3M nodes, ~180M edge rows; the exponents' 3x extrapolation
    # check): offset shrinks again so 299 replica shifts stay under
    # the 10^7 dst shift (299*30000 + 300000 = 9.27e6) while
    # remaining > max l_partkey.
    copy(graph_arms(args.src, 300, offset=30000),
         os.path.join(args.out, "graph", "x300"), "lineitem")


if __name__ == "__main__":
    main()
