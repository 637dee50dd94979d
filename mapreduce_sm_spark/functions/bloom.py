"""Explicit Bloom filter as pure column expressions (membership member of
the sketch family — HLL counts distinct, Count-Min counts occurrences,
Misra-Gries finds heavy items; Bloom answers "might x be in S").

Public literature: Bloom, "Space/time trade-offs in hash coding with
allowable errors" (CACM 1970). Distinct from Catalyst's runtime
bloom-filter injection (tests/test_runtime_filter.py asserts that one):
this filter is a FIRST-CLASS value — a map<word_index, 64-bit mask>
built by one partial-aggregable groupBy over the key set — so it can be
stored, re-broadcast across jobs, and OR-merged with another filter
built with the same geometry (cell-wise bit_or — the same mergeability
argument as the other sketches). The 100 TB use is ingest scrubbing:
build the filter over yesterday's 10^10 ingested keys once (m/8 bytes,
independent of key width), then prune today's corpus with a broadcast
map lookup per row — no join, no shuffle of the big side, false
positives only (candidates re-checked by the exact path they feed).

Geometry: m_bits must be a multiple of 64; k seeds index k bit
positions per key via pmod(xxhash64(key, seed), m). The filter is ONE
row holding map<long,long> of only the OCCUPIED words (dense filters
approach m/8 bytes; sparse ones pay only for set words) PLUS its own
geometry (m_bits, seeds) as columns — a filter that outlives the job
that built it must carry its geometry, because merging or probing two
filters built with different m_bits/seeds yields a plausible-looking
map whose probes can be FALSE NEGATIVE. bloom_merge and the guarded
probe raise at action time when geometries differ.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Default geometry for the registered contract query: 2^17 bits (16 KiB,
# 2048 words) and 3 hash seeds. At the largest fixture SF (sf0.1,
# ~3000 BUILDING customers) the load is 3000*3/131072 ≈ 0.069, so the
# per-probe false-positive rate is (1-e^-0.069)^3 ≈ 2.9e-4 — far under
# the 1% contract bound. Production sizing: ~10 bits/key for ~1% FP.
BLOOM_M_BITS = 1 << 17
BLOOM_SEEDS = (1, 2, 3)


def _positions(key: Column, m_bits: int, seeds: tuple[int, ...]) -> list[Column]:
    return [F.pmod(F.xxhash64(key, F.lit(s)), F.lit(m_bits)) for s in seeds]


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = BLOOM_M_BITS,
    seeds: tuple[int, ...] = BLOOM_SEEDS,
) -> DataFrame:
    """1-row DataFrame [bloom: map<long,long>, m_bits: long,
    seeds: array<long>] over the key column.

    One explode (k rows per key) + one partial-aggregable groupBy over at
    most m_bits/64 words + one collect-free map_from_entries fold: the
    build shuffles <= m_bits/64 rows per partition no matter how many
    keys go in. The geometry rides along as columns so a persisted filter
    is self-describing (see module docstring).
    """
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, seeds)))
    words = (
        keys.select(pos.alias("pos"))
        .select(
            (F.col("pos") / 64).cast("long").alias("word"),
            (F.col("pos") % 64).cast("int").alias("bit"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").alias("mask"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "mask"))).alias("bloom")
    ).select("bloom", *_geometry_literals(m_bits, seeds))


def _geometry_literals(m_bits: int, seeds: tuple[int, ...]) -> list[Column]:
    return [
        F.lit(int(m_bits)).cast("long").alias("m_bits"),
        F.array(*[F.lit(int(s)).cast("long") for s in seeds]).alias("seeds"),
    ]


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR-merge two 1-row filters built with the SAME geometry: the result
    is bit-identical to building one filter over the union of their key
    sets (each bit is an OR of per-key contributions, and OR is
    associative-commutative) — the sketch-family merge law that lets
    per-day / per-shard filters roll up without rescanning keys.

    Geometry guard: the inputs carry (m_bits, seeds) columns; if they
    disagree, the merged map would be probed with the wrong bucketing
    (false negatives possible), so the merge RAISES at action time
    instead of returning it.
    """
    both = a.unionAll(b)
    geom = both.agg(
        F.count_distinct(F.struct("m_bits", "seeds")).alias("n_geom"),
        F.first("m_bits").alias("m_bits"),
        F.first("seeds").alias("seeds"),
    )
    entries = both.select(F.explode("bloom").alias("word", "mask"))
    merged = entries.groupBy("word").agg(F.bit_or("mask").alias("mask"))
    folded = merged.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "mask"))).alias("bloom")
    )
    # The guard rides EVERY output column, not just m_bits: a consumer that
    # selects only 'bloom' (or probes without stored_geometry) would let
    # Catalyst column-prune an m_bits-only guard away, silently admitting a
    # merge of differently-built filters — the exact false-negative case the
    # guard exists to prevent (ADVICE r09).
    def _guarded(col: Column, typ: str) -> Column:
        return F.when(F.col("n_geom") == 1, col).otherwise(
            F.raise_error(
                F.lit("bloom_merge: filters were built with different geometry (m_bits/seeds)")
            ).cast(typ)
        )

    return folded.crossJoin(geom).select(
        _guarded(F.col("bloom"), "map<bigint,bigint>").alias("bloom"),
        _guarded(F.col("m_bits"), "bigint").alias("m_bits"),
        _guarded(F.col("seeds"), "array<bigint>").alias("seeds"),
    )


def bloom_might_contain(
    key: Column,
    bloom: Column,
    m_bits: int = BLOOM_M_BITS,
    seeds: tuple[int, ...] = BLOOM_SEEDS,
    stored_geometry: tuple[Column, Column] | None = None,
) -> Column:
    """Boolean membership probe — pure codegen'd expressions, no join.

    True iff every seed's bit is set. Guarantees: never false on a key
    that was built in (no false negatives); may be true for absent keys
    at the geometry's FP rate.

    stored_geometry: pass the filter frame's (m_bits, seeds) columns to
    assert at action time that the probe's geometry matches the one the
    filter was BUILT with — mandatory hygiene when the filter was loaded
    from storage rather than built in this job (a mismatched probe is
    silently wrong, with false negatives possible).
    """
    out = F.lit(True)
    for p in _positions(key, m_bits, seeds):
        word = (p / 64).cast("long")
        bit = (p % 64).cast("int")
        mask = F.coalesce(F.element_at(bloom, word), F.lit(0).cast("long"))
        out = out & (F.getbit(mask, bit) == 1)
    if stored_geometry is not None:
        m_col, s_col = stored_geometry
        built_m, built_s = _geometry_literals(m_bits, seeds)
        ok = (m_col == built_m) & (s_col == built_s)
        out = F.when(ok, out).otherwise(
            F.raise_error(
                F.lit("bloom probe: probe geometry does not match the filter's stored geometry")
            ).cast("boolean")
        )
    return out
