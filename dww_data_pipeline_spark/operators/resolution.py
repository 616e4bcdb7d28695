"""Entity resolution (SURVEY §7.2 M2) — the reference's company/role
resolution re-expressed set-oriented.

Reference flow (GetWeta.py:125-228): per credit, parse the note (F1),
look the parsed company up in companyMap (J2), fall back to an IMDb
search + fuzzy score (F2, J8 memo), skip sentinel `zzz_` entries
(P5), dedupe edges (J7). Row-at-a-time with an in-memory memo; here
it is three broadcast joins and one anti-join — no memo needed under
set-oriented execution (SURVEY §2.3 J8).

At 100 TB the maps stay broadcastable (they are curated, bounded
artifacts — companyMap is 32 KB in the reference); if a map ever
outgrows the threshold the same joins degrade gracefully to
sort-merge with AQE skew handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dww_data_pipeline_spark.functions.fuzzy import levenshtein_ratio, sequence_matcher_ratio
from dww_data_pipeline_spark.functions.strings import (
    is_sentinel,
    parse_company,
    parse_division,
    parse_role,
)


def parse_credits(credits: DataFrame, notes_col: str = "notes") -> DataFrame:
    """F1: parsed (role, company_search, division) columns from raw
    credit notes (reference ParseCompanyFromPersonNotes,
    GetWeta.py:370-411). Division is appended to the role with ', '
    as the reference does (GetWeta.py:405-409)."""
    note = F.col(notes_col)
    role = parse_role(note)
    division = parse_division(note)
    return credits.withColumns(
        {
            "role": F.when(division != "", F.concat(role, F.lit(", "), division)).otherwise(
                role
            ),
            "company_search": parse_company(note),
        }
    )


def resolve_companies(
    parsed: DataFrame,
    company_map: DataFrame,
    exact_parity: bool = False,
) -> DataFrame:
    """J2 + F2 + P5: resolve parsed company strings against the
    curated map (broadcast left join on the search string), score the
    match 0-100, and blank out sentinel `zzz_` entries (reference
    GetWeta.py:157-174, 161-164).

    company_map columns: (search, name, id). Unmatched searches keep
    NULL company_id/company_name — the reference would fall through
    to an IMDb web search (out of engine scope; the fuzzy score
    supports re-ranking candidate joins instead).

    exact_parity=True uses the SequenceMatcher pandas_udf (reference
    fuzz.ratio parity); default is the JVM-side levenshtein ratio.
    """
    ratio_fn = sequence_matcher_ratio if exact_parity else levenshtein_ratio
    joined = parsed.join(
        F.broadcast(company_map),
        parsed.company_search == company_map.search,
        "left",
    )
    matched_name = F.when(is_sentinel(F.col("name")), F.lit("")).otherwise(F.col("name"))
    matched_id = F.when(is_sentinel(F.col("name")), F.lit("")).otherwise(F.col("id"))
    return (
        joined.withColumn(
            "match_ratio",
            F.when(
                F.col("name").isNotNull() & ~is_sentinel(F.col("name")),
                ratio_fn(F.col("company_search"), F.col("name")),
            ).otherwise(F.lit(0)),
        )
        .withColumn("company_name", matched_name)
        .withColumn("company_id", matched_id)
        .drop("search", "name", "id")
    )


def resolve_companies_lsh(
    parsed: DataFrame,
    company_map: DataFrame,
    num_hashes: int = 8,
    bands: int = 8,
    shingle_k: int = 2,
    min_ratio: int = 60,
) -> DataFrame:
    """Entity resolution WITHOUT broadcast: candidate generation by
    MinHash-LSH over character-shingled names, then fuzzy re-rank.

    The broadcast join in ``resolve_companies`` assumes the curated
    map stays tiny (true in the reference). When the dimension grows
    past the broadcast threshold (millions of alias rows), this path
    keeps the same semantics at fact scale (SURVEY §7.2 M5:
    'similarity search via LSH scaling M2 beyond broadcastable maps'):

    1. both sides shingle their name strings (char n-grams catch
       misspellings, the fuzzy-match usecase) and band their minhash
       signatures — candidate pairs arise only within shared buckets;
    2. candidates are scored with the levenshtein ratio;
    3. the best-scoring candidate ≥ min_ratio wins per search string
       (row_number over a per-search window).

    Default banding is 1 row per band (bands == num_hashes): entity
    resolution wants RECALL from the candidate stage — false
    candidates cost one fuzzy score each, missed candidates cost a
    lost match; multi-row bands are for dedup precision instead.

    Returns parsed rows + (company_name, company_id, match_ratio);
    unmatched searches keep NULLs, like the broadcast path.
    """
    from dww_data_pipeline_spark.functions.text import char_ngrams

    if bands > num_hashes or num_hashes % bands != 0:
        # bands > num_hashes would make every bucket "" (a full cross
        # join — the exact blowup LSH exists to avoid); a non-divisor
        # silently wastes hashes
        raise ValueError(f"bands={bands} must evenly divide num_hashes={num_hashes}")
    rows_per_band = num_hashes // bands

    def banded(df: DataFrame, name_col: str, id_cols: list[str]) -> DataFrame:
        grams = F.array_distinct(char_ngrams(F.col(name_col), n=shingle_k))
        sig = [
            F.array_min(
                F.transform(grams, (lambda i: (lambda g: F.md5(F.concat(F.lit(f"{i}|"), g))))(i))
            ).alias(f"m{i}")
            for i in range(num_hashes)
        ]
        with_sig = df.select(*id_cols, F.col(name_col).alias("_name"), *sig)
        bbs = [
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",", *[F.col(f"m{b * rows_per_band + r}") for r in range(rows_per_band)]
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
        return with_sig.select(
            *id_cols, "_name", F.explode(F.array(*bbs)).alias("bb")
        ).select(*id_cols, "_name", "bb.band", "bb.bucket")

    searches = parsed.select("company_search").where(
        F.col("company_search").isNotNull() & (F.col("company_search") != "")
    ).distinct()
    s_banded = banded(searches, "company_search", ["company_search"])
    m_banded = banded(company_map, "search", ["name", "id"]).withColumnRenamed(
        "_name", "map_search"
    )
    candidates = (
        s_banded.join(m_banded, ["band", "bucket"])
        .select("company_search", "map_search", "name", "id")
        .distinct()
        .withColumn("exact_hit", F.col("map_search") == F.col("company_search"))
        # score against the CANONICAL name, matching the broadcast
        # path and the reference (fuzz.ratio(company_node_name, parsed),
        # GetWeta.py:236-237) — scoring against the alias key would
        # yield different ratios for the same resolved entity
        .withColumn(
            "match_ratio", levenshtein_ratio(F.col("company_search"), F.col("name"))
        )
        # exact alias hits bypass the ratio gate — the reference's map
        # lookup is an exact dict hit regardless of any score (and this
        # is the only way a sentinel entry may apply: as an exact-alias
        # verdict, never as a fuzzy winner over a legitimate candidate)
        .filter(
            F.col("exact_hit")
            | (~is_sentinel(F.col("name")) & (F.col("match_ratio") >= min_ratio))
        )
    )
    w = Window.partitionBy("company_search").orderBy(
        F.desc("exact_hit"), F.desc("match_ratio"), F.col("id")
    )
    best = (
        candidates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "company_search",
            F.when(is_sentinel(F.col("name")), F.lit("")).otherwise(F.col("name")).alias(
                "company_name"
            ),
            F.when(is_sentinel(F.col("name")), F.lit("")).otherwise(F.col("id")).alias(
                "company_id"
            ),
            F.when(is_sentinel(F.col("name")), F.lit(0))
            .otherwise(F.col("match_ratio"))
            .alias("match_ratio"),
        )
    )
    return parsed.join(best, "company_search", "left").withColumn(
        "match_ratio", F.coalesce(F.col("match_ratio"), F.lit(0))
    )


def apply_role_map(worked_for: DataFrame, role_map: DataFrame) -> DataFrame:
    """J3: raw role → trueRole via broadcast left join; zzz_baddata
    roles map to '' (reference SetTrueRoles GetWeta.py:534-543)."""
    joined = worked_for.join(
        F.broadcast(role_map), worked_for.role == role_map.raw_role, "left"
    )
    true_role = (
        F.when(F.col("name").isNull(), F.lit(""))
        .when(is_sentinel(F.col("name")), F.lit(""))
        .otherwise(F.col("name"))
    )
    return joined.withColumn("true_role", true_role).drop("raw_role", "name")


def apply_locations(
    worked_for: DataFrame, locations: DataFrame, regions: DataFrame
) -> DataFrame:
    """J4: company name → (geo_loc, location) → global region — two
    chained broadcast left joins (reference SetLocations
    GetWeta.py:567-584)."""
    out = worked_for.join(
        F.broadcast(locations),
        worked_for.company_name == locations.loc_company_name,
        "left",
    ).drop("loc_company_name")
    out = out.join(
        F.broadcast(regions),
        F.lower(out.location) == F.lower(regions.reg_location),  # case-symmetric
        "left",
    ).drop("reg_location")
    return out


def dedupe_edges(
    new_edges: DataFrame,
    existing_edges: DataFrame,
    keys: list[str] | None = None,
) -> DataFrame:
    """J7: drop candidate edges already present (same person, company,
    movie) — left anti-join replacing the reference's per-edge
    existence probe (GetWeta.py:239-247)."""
    keys = keys or ["person_id", "company_id", "movie_id"]
    return new_edges.join(existing_edges.select(*keys), keys, "left_anti")
