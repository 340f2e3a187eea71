"""Distributed PageRank over a document link graph -- fixed-iteration,
bit-exact, under the driver's exact-oracle gate.

A web-scale corpus pipeline ranks pages by link authority (quality signal
for curation / sampling weights).  PageRank is the canonical iterative
dataflow: per round, every node's rank is scattered along its out-edges
and gathered by destination -- in Spark, one join (edge x rank) plus one
groupBy-sum per iteration, both shuffling only ``(node_id, double)`` pairs.

Bit-exactness construction (the repo float-parity policy demands every
oracle be IEEE-exactly reproducible; a float PageRank normally is NOT,
because float sums are order-dependent).  This implementation makes every
float operation EXACT, so aggregation order cannot matter:

* out-degrees are powers of two (2/4/8 by ``id % 3``), so each edge
  contribution ``rank / outdeg`` is an exact binary scaling;
* damping is 3/4: ``new = 1/4 + (3/4) * s`` multiplies by 3 (integer) and
  rescales by a power of two -- exact while operands stay in range;
* by induction every rank after iteration k is a multiple of 2^-5k (three
  bits from /8, two from *3/4), bounded by total mass N: with k=3
  iterations and N < 2^24 nodes the values need at most 24+15 < 53
  mantissa bits, so EVERY partial sum is exact and order-independent --
  Spark and DuckDB produce bit-identical doubles regardless of
  partitioning or aggregation order.

The edge list is synthesized deterministically from node ids (the same
``mix_hash`` both engines replay), so the whole operator -- graph
construction + 3 iterations -- is a closed-form SQL replay.

100 TB shape: ranks and edges shuffle as bare longs/doubles (payloads
never enter the loop); the gather is a map-side-combinable sum keyed by
destination; lineage is truncated with ``localCheckpoint`` each round so
the plan stays O(1) across iterations (the cluster.py discipline).  On a
real cluster, co-partitioning edges and ranks by the join key makes the
scatter shuffle-free after round one (edges are loop-invariant and cached;
ranks arrive already hash-partitioned by the previous gather).

Reference scope note: haskell-postgis is a geometry codec library; graph
analytics belong to the training-data-pipeline mandate (SURVEY.md
section 2.3) layered on the codec core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .curation import mix_hash, mix_hash_sql

DAMP_NUM, DAMP_DEN = 3, 4          # damping 3/4: dyadic-exact
_TELEPORT = 1.0 / DAMP_DEN         # (1 - d) = 1/4, exact
_MAX_OUTDEG = 8                    # outdeg in {2, 4, 8} = 2^(1 + id % 3)


def synth_edges(nodes: DataFrame, id_col: str = "doc_id",
                n_nodes: int | None = None) -> DataFrame:
    """Deterministic link graph over ``nodes``: node i emits
    ``2^(1 + i % 3)`` edges whose destinations are ``mix_hash(i*16 + j)
    mod N`` -- a pure function of the id, identically replayable in SQL.
    Self-loops and duplicate targets are legal (contribution weight is
    1/outdeg per EDGE, multiplicity included, on both sides)."""
    if n_nodes is None:
        n_nodes = nodes.count()          # bounded scalar action
    # F.shiftleft's Python signature wants an int shift; SQL takes a column
    deg = F.expr(f"CAST(shiftleft(1, CAST(1 + {id_col} % 3 AS INT)) AS BIGINT)")
    return (
        nodes.select(F.col(id_col).alias("src"), deg.alias("outdeg"))
        .withColumn("j", F.explode(F.sequence(F.lit(0), F.lit(_MAX_OUTDEG - 1))))
        .where(F.col("j") < F.col("outdeg"))
        .withColumn("dst", F.pmod(mix_hash(F.col("src") * 16 + F.col("j")),
                                  F.lit(n_nodes)))
        .select("src", "dst", "outdeg")
    )


def pagerank(nodes: DataFrame, edges: DataFrame, id_col: str = "doc_id",
             iterations: int = 3, checkpoint: bool = True) -> DataFrame:
    """Fixed-iteration PageRank; returns (id_col, pagerank).  Dangling
    nodes (no out-edges) simply leak mass, as in the classic formulation;
    the synthesized graph has none (every node has outdeg >= 2)."""
    ids = nodes.select(F.col(id_col).alias("id"))
    ranks = ids.withColumn("r", F.lit(1.0))
    e = edges.select(F.col("src").alias("id"), "dst", "outdeg")
    for _ in range(iterations):
        gathered = (
            e.join(ranks, "id")
            .select("dst", (F.col("r") / F.col("outdeg")).alias("c"))
            .groupBy("dst").agg(F.sum("c").alias("s"))
        )
        ranks = (
            ids.join(gathered, ids["id"] == gathered["dst"], "left")
            .select(ids["id"],
                    (F.lit(_TELEPORT)
                     + F.lit(float(DAMP_NUM) / DAMP_DEN)
                     * F.coalesce(F.col("s"), F.lit(0.0))).alias("r"))
        )
        if checkpoint:
            # stats-reset checkpoint: the plain localCheckpoint snapshots
            # sizeInBytes and the next round's join estimates multiply it
            # -- doubly-exponential growth that breaks past ~10 rounds
            # (full derivation at cluster._local_checkpoint_flat_stats)
            from .cluster import _local_checkpoint_flat_stats

            ranks = _local_checkpoint_flat_stats(ranks)
    return ranks.select(F.col("id").alias(id_col),
                        F.col("r").alias("pagerank"))


def pagerank_docs(spark: SparkSession, sf_dir: str,
                  iterations: int = 3) -> DataFrame:
    """The driver query body: synthesize the link graph over ``documents``
    and rank it; output (doc_id, outdeg, pagerank)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    edges = synth_edges(docs, n_nodes=n)
    pr = pagerank(docs, edges, iterations=iterations)
    # outdeg is a pure function of the id: a column, not a self-join
    deg = F.expr("CAST(shiftleft(1, CAST(1 + doc_id % 3 AS INT)) AS BIGINT)")
    return pr.select("doc_id", deg.alias("outdeg"), "pagerank")


def pagerank_oracle_sql(iterations: int = 3) -> str:
    """The identical graph + iterations as chained DuckDB CTEs.  Every
    float value is a dyadic rational within exact range (see module
    docstring), so SUM order cannot change a bit."""
    dst = f"({mix_hash_sql('(d.doc_id * 16 + t.j)')}) % (SELECT n FROM __n)"
    ctes = [
        "__n AS (SELECT COUNT(*) AS n FROM documents)",
        f"""__edges AS MATERIALIZED (
  SELECT d.doc_id AS src, {dst} AS dst,
         CAST(1 << CAST(1 + d.doc_id % 3 AS INT) AS BIGINT) AS outdeg
  FROM documents d, (SELECT UNNEST(range({_MAX_OUTDEG})) AS j) t
  WHERE t.j < (1 << CAST(1 + d.doc_id % 3 AS INT)))""",
        "__r0 AS (SELECT doc_id AS id, CAST(1 AS DOUBLE) AS r FROM documents)",
    ]
    d_num = f"CAST({DAMP_NUM} AS DOUBLE) / {DAMP_DEN}"
    tele = f"CAST(1 AS DOUBLE) / {DAMP_DEN}"
    for k in range(1, iterations + 1):
        ctes.append(f"""__g{k} AS (
  SELECT e.dst AS id, SUM(r.r / e.outdeg) AS s
  FROM __edges e JOIN __r{k - 1} r ON e.src = r.id GROUP BY e.dst)""")
        ctes.append(f"""__r{k} AS (
  SELECT d.doc_id AS id,
         {tele} + {d_num} * COALESCE(g.s, CAST(0 AS DOUBLE)) AS r
  FROM documents d LEFT JOIN __g{k} g ON d.doc_id = g.id)""")
    cte_block = ",\n".join(ctes)
    return f"""
WITH {cte_block}
SELECT d.doc_id,
       CAST(1 << CAST(1 + d.doc_id % 3 AS INT) AS BIGINT) AS outdeg,
       r.r AS pagerank
FROM documents d JOIN __r{iterations} r ON d.doc_id = r.id"""


def undirected_edges(edges: DataFrame) -> DataFrame:
    """Canonical undirected edge set from a directed edge list: (a, b) with
    a < b, self-loops dropped, duplicates collapsed."""
    return (
        edges.where(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"))
        .distinct()
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over the undirected graph -- the classic
    link-farm / community-density signal: (node, n_triangles), nodes in at
    least one triangle.

    Plan: the canonical two-join enumeration over ID-ORIENTED edges --
    wedges a<b<c from E(a,b) JOIN E(b,c), closed by E(a,c). Orienting every
    edge low-id -> high-id means each triangle is generated EXACTLY once
    (no /3 correction, no dedup shuffle) and the wedge fan-out is bounded
    by out-degree, not total degree (on real graphs one orients by degree
    -- the id plays that role here since synth out-degrees are bounded by
    8). Only (long, long) edge rows shuffle; per-node counts are one
    explode + map-side-combined sum."""
    e = undirected_edges(edges)
    w = (e.alias("e1")
         .join(e.alias("e2"), F.col("e1.b") == F.col("e2.a"))
         .select(F.col("e1.a").alias("a"), F.col("e1.b").alias("b"),
                 F.col("e2.b").alias("c")))
    tri = (w.alias("w")
           .join(e.alias("e3"), (F.col("w.a") == F.col("e3.a"))
                 & (F.col("w.c") == F.col("e3.b"))))
    return (
        tri.select(F.explode(F.array("w.a", "w.b", "w.c")).alias("node"))
        .groupBy("node").agg(F.count("*").alias("n_triangles"))
    )


def synth_edges_sql(table: str = "documents", id_col: str = "doc_id") -> str:
    """The synth_edges graph as a DuckDB CTE body (same construction
    pagerank_oracle_sql inlines)."""
    dst = f"({mix_hash_sql(f'(d.{id_col} * 16 + t.j)')}) % (SELECT n FROM __n)"
    return f"""
  SELECT d.{id_col} AS src, {dst} AS dst
  FROM {table} d, (SELECT UNNEST(range({_MAX_OUTDEG})) AS j) t
  WHERE t.j < (1 << CAST(1 + d.{id_col} % 3 AS INT))"""


def triangle_oracle_sql(table: str = "documents",
                        id_col: str = "doc_id") -> str:
    """The identical oriented enumeration in DuckDB SQL."""
    return f"""
WITH __n AS (SELECT COUNT(*) AS n FROM {table}),
__edges AS MATERIALIZED ({synth_edges_sql(table, id_col)}),
u AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      FROM __edges WHERE src <> dst),
w AS (SELECT u1.a, u1.b, u2.b AS c
      FROM u u1 JOIN u u2 ON u1.b = u2.a),
t AS (SELECT w.a, w.b, w.c
      FROM w JOIN u u3 ON u3.a = w.a AND u3.b = w.c)
SELECT node, COUNT(*) AS n_triangles FROM (
  SELECT unnest([a, b, c]) AS node FROM t) __x
GROUP BY node"""
