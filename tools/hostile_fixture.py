"""Build a hostile-but-contract-respecting fixture from sf0.001.

PK columns stay unique and non-null; every other column gets nulls,
full-row ties, unicode/NBSP/vertical-tab text, BOM-prefixed text,
4-byte supplementary-plane emoji (JVM surrogate pairs vs DuckDB code
points — round 10), whitespace-only and empty strings, exact-duplicate
documents, malformed JSON, extreme numerics (1e12 beyond the
DECIMAL(18,6) domain, -0.0), and the full failed-encode embedding
class (NULL/empty/NaN/Inf/null-element/zero-norm/identical vectors)
injected. Lone surrogates are deliberately absent — invalid UTF-8 is
unrepresentable in parquet strings and DuckDB VARCHAR alike (see the
documents block). Writes parquet to the target
dir in the standard table layout, so ``tools/parity.py <dst>`` runs
every declared oracle against it.

The round-9 sweep over this fixture surfaced six real divergence
classes (see tests/test_hostile_parity.py, which regression-pins
them); new hostile row classes belong HERE so the whole registry
inherits them on the next sweep.

Usage: python tools/hostile_fixture.py [dst_dir]
"""

from __future__ import annotations

import os

import duckdb

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def build(dst: str, src: str = "/root/testdata/sf0.001") -> str:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    os.makedirs(dst, exist_ok=True)

    def copy_plus(table: str, extra_sql: str) -> None:
        con.execute(
            f"""
            COPY (
              SELECT * FROM read_parquet('{src}/{table}.parquet')
              UNION ALL BY NAME
              {extra_sql}
            ) TO '{dst}/{table}.parquet' (FORMAT PARQUET)
            """
        )

    copy_plus("region", """
      SELECT 900 AS r_regionkey, NULL AS r_name
    """)

    copy_plus("nation", """
      SELECT * FROM (VALUES
        (900, NULL, 0),
        (901, 'ALGERIA', NULL),          -- duplicate name, null FK
        (902, '', 3)                     -- empty-string name
      ) t(n_nationkey, n_name, n_regionkey)
    """)

    copy_plus("customer", """
      SELECT * FROM (VALUES
        (90001, NULL, NULL, NULL, NULL),
        (90002, 'Customer#tie', 3, 1000.0, 'BUILDING'),
        (90003, 'Customer#tie', 3, 1000.0, 'BUILDING'),   -- full tie pair
        (90004, 'Customer#neg', 7, -0.0, ''),             -- -0.0 + empty seg
        (90005, 'Customer#unicode é x', 24, 1e15, 'AUTOMOBILE')
      ) t(c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
    """)

    copy_plus("supplier", """
      SELECT * FROM (VALUES
        (9001, NULL, NULL, NULL),
        (9002, 'Supplier#tie', 3, 4000.0),
        (9003, 'Supplier#tie', 3, 4000.0)
      ) t(s_suppkey, s_name, s_nationkey, s_acctbal)
    """)

    copy_plus("part", """
      SELECT * FROM (VALUES
        (90001, NULL, NULL, NULL, NULL, NULL),
        (90002, 'tie part', 'Brand#13', 'SMALL PLATED TIN', 0, 0.0),
        (90003, 'tie part', 'Brand#13', 'SMALL PLATED TIN', 0, 0.0)
      ) t(p_partkey, p_name, p_brand, p_type, p_size, p_retailprice)
    """)

    copy_plus("orders", """
      SELECT * FROM (VALUES
        (990001, NULL, NULL, NULL, NULL, NULL),
        (990002, 1, 'O', 1000.0, TIMESTAMP '1995-06-15 00:00:00', '1-URGENT'),
        (990003, 1, 'O', 1000.0, TIMESTAMP '1995-06-15 00:00:00', '1-URGENT'),
        (990004, 4, 'F', -1.5,  TIMESTAMP '1992-01-01 00:00:00', '')
      ) t(o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)
    """)

    copy_plus("lineitem", """
      SELECT * FROM (VALUES
        (990001, NULL, NULL, 1, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
        (990002, 1, 1, 1, 17.0, 1000.0, 0.0, 0.0, 'N', 'O', TIMESTAMP '1995-06-17 00:00:00'),
        (990002, 1, 1, 2, 17.0, 1000.0, 0.0, 0.0, 'N', 'O', TIMESTAMP '1995-06-17 00:00:00'),
        (990004, 2, 2, 1, 0.0, 0.0, 1.0, 1.0, 'R', 'F', TIMESTAMP '1992-02-02 00:00:00')
      ) t(l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
          l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate)
    """)

    # events: source is TIMESTAMP(NANOS); normalize the copy to micros.
    # 1e12 sits beyond the DECIMAL(18,6) domain -> exercises try_cast.
    con.execute(
        f"""
        COPY (
          SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
          FROM read_parquet('{src}/events.parquet')
          UNION ALL BY NAME
          SELECT * FROM (VALUES
            (99001, NULL, NULL, NULL, NULL, NULL),
            (99002, TIMESTAMP '2024-01-15 12:00:00', 3, 'view', 5.0, '{{"k": 1}}'),
            (99003, TIMESTAMP '2024-01-15 12:00:00', 3, 'view', 5.0, '{{"k": 1}}'),
            (99004, TIMESTAMP '2024-01-15 12:00:00', 4, 'view', 5.0, 'not json'),
            (99005, TIMESTAMP '2024-01-15 12:00:01', 4, '', -0.0, ''),
            (99006, TIMESTAMP '2024-01-15 12:00:02', 4, 'purchase', 1e12, NULL),
            -- NULL ts on a REAL user: sits at the partition HEAD under
            -- Spark's NULLS FIRST but the TAIL under DuckDB's NULLS
            -- LAST — the row class that forced the NULL-ts contract on
            -- the sessionizers and event-time window assigners
            (99007, NULL, 3, 'view', 1.0, '{{}}'),
            -- type-diverse + path-hostile JSON props (round 10): every
            -- canonical jtype {{string,number,bool,array,object,null}}
            -- appears for key k, plus a dotted key that DuckDB's
            -- json_type(j, key) would resolve as a PATH — the class the
            -- json_schema_profile key-charset gate exists for — and a
            -- top-level JSON scalar (valid JSON, zero keys)
            (99010, TIMESTAMP '2024-01-15 12:01:00', 5, 'view', 1.0,
             '{{"k": "s", "extra": 1.5}}'),
            (99011, TIMESTAMP '2024-01-15 12:01:01', 5, 'view', 1.0,
             '{{"k": true, "arr": [1, 2]}}'),
            (99012, TIMESTAMP '2024-01-15 12:01:02', 5, 'view', 1.0,
             '{{"k": null, "o": {{"z": 1}}, "a.b": 7}}'),
            (99013, TIMESTAMP '2024-01-15 12:01:03', 5, 'view', 1.0, '69'),
            -- round-10 review classes: a FRACTIONAL k (Spark try_cast
            -- NULLs '1.5' where DuckDB would coerce to 2 — the
            -- integer-literal regex gate) and a DUPLICATE-keyed
            -- payload (Spark map keeps LAST, DuckDB path lookup
            -- resolves FIRST — the distinctness gate). NaN metric
            -- values stay OUT of this fixture by design: the repo's
            -- finite-value contract routes NaN/±Inf through
            -- data_expectations upstream, and ~20 oracles rely on it
            -- (DuckDB v1.0 TRY_CAST raises on NaN); the one defensive
            -- isfinite guard (latency_percentile_bands) is pinned by
            -- its own planted-NaN test instead
            (99014, TIMESTAMP '2024-01-15 12:01:04', 5, 'view', 1.0,
             '{{"k": 1.5}}'),
            (99015, TIMESTAMP '2024-01-15 12:01:05', 5, 'view', 1.0,
             '{{"k": 1, "k": "s"}}')
          ) t(event_id, ts, user_id, event_type, value, props)
        ) TO '{dst}/events.parquet' (FORMAT PARQUET)
        """
    )

    # \x0b (vertical tab) targets the Java-\s-vs-RE2-\s tokenizer gap;
    # 99008 is BOM-prefixed (U+FEFF is NOT whitespace to either
    # tokenizer, so it fuses onto the first token — both engines must
    # agree it does); 99009 carries 4-byte supplementary-plane emoji
    # (UTF-16 surrogate pairs on the JVM — length/substr/regex must
    # count code points, not UTF-16 units, to match DuckDB). LONE
    # surrogates are deliberately absent: they are unrepresentable in
    # valid UTF-8, and both parquet strings and DuckDB VARCHAR reject
    # them at write time — not a reachable input class for this engine.
    copy_plus("documents", """
      SELECT * FROM (VALUES
        (99001, NULL, NULL, NULL, NULL),
        (99002, '', 'en', 'web', 0),
        (99003, '   ', 'en', 'web', 3),
        (99004, 'fused pair and vt\x0btoken here plus café élève text', 'fr', 'books', 48),
        (99005, 'tie doc exact duplicate body for dedup stress', 'en', 'web', 46),
        (99006, 'tie doc exact duplicate body for dedup stress', 'en', 'web', 46),
        (99007, 'one', 'xx', '', 3),
        (99008, chr(65279) || 'bom prefixed doc the first token wears a bom', 'en', 'web', 46),
        (99009, 'emoji \U0001f600 doc with \U0001f680 four byte chars in the text', 'en', 'social', 52),
        (9797, 'Contamination canary: this exact sentence leaks into training data verbatim.', 'en', 'web', 76),
        (99010, 'A scraped page quoting: contamination canary: this exact sentence leaks into training data verbatim. Plus trailing chatter.', 'en', 'web', 123),
        (99011, 'Contact jane.doe+spam@example-mail.org or 555-867-5309, SSN 123-45-6789, server 192.168.001.042 backup 10.0.0.1, alt email bob@test.io.', 'en', 'web', 135),
        (9603, 'The Euler-Mascheroni constant, gamma = 0.5772, appears in Mertens theorems about primes.', 'en', 'web', 89),
        (99012, 'Blog post says: THE EULER' || chr(8212) || 'MASCHERONI CONSTANT; GAMMA' || chr(8212) || '0.5772' || chr(8212) || 'APPEARS IN MERTENS THEOREMS, quoted with terrible typography.', 'en', 'web', 138),
        (99013, 'buy now click here buy now click here buy now click here buy now click here limited offer act fast', 'en', 'social', 99),
        (99014, 'the offer is on the table for a limited time. the offer is on the table for a limited time. the offer is on the table for a limited time. the offer is on the table for a limited time. the offer is on the table for a limited time.', 'en', 'web', 229),
        (99015, 'The report is ready and it is on the server for review. Please send a note to the team in the morning. Contact me at alice@example.org for the final copy of the plan and the data file today.', 'en', 'web', 189),
        (9894, 'Retrieval quality depends on the encoder the index and the metric. We measure recall at ten for every shard and report the mean over query sets. The gap between exact search and the approximate index narrows as the probe count grows. Latency budgets decide how many cells a query may visit in practice.', 'en', 'web', 298),
        (99016, 'Retrieval quality depends upon the encoder the index and the metric. We measure hitrate at ten for every shard and report the mean across query sets. The gap between exact search and the quantized index narrows as the probe count grows. Latency budgets bound how many cells a query may visit in practice.', 'en', 'web', 301)
      ) t(doc_id, text, lang, source, n_chars)
    """)
    # 99011 plants every PII regex class (2 emails, 1 SSN, 1 phone,
    # 2 IPv4) so pii_scrub_counts' per-class counters and the
    # sequential-redaction length all fire on every sweep (the
    # non-vacuous-oracle rule) — the base fixture text has no digits
    # or @ at all.
    # 9797 (% 97 = 0, under the eval id cap) + 99010 (% 97 ≠ 0, quotes
    # 9797's normalized 40-char head verbatim) plant a REAL
    # contamination pair for decontaminate_substring — its recorded
    # parity was 0-rows-both-sides at every swept SF (ADVICE r10), so
    # the join/count hit path was proven only by the planted unit
    # test. Now every sweep exercises a nonzero hit.
    # 9603 (97·99, under the eval cap) + 99012 (quotes 9603 with
    # case flipped and hyphen/comma typography swapped to em-dashes/
    # semicolons) plant the round-12 PUNCTUATION-FOLDED contamination
    # pair: decontaminate_normalized must hit it while
    # decontaminate_substring must NOT (the fold provably widens the
    # net) — both directions pinned in tests/test_hostile_parity.py.
    # 99013 is the repeated-slogan spam doc that fires
    # repetition_gate's flag path at every sweep (its trigram chars
    # are ~90% duplicated; the base sf0.001 corpus flags nothing).
    # 9894 (97·102, under the eval cap) + 99016 plant the round-13
    # PARAPHRASE contamination pair for decontaminate_fuzzy: 99016
    # carries 9894's text with every ~10th word substituted
    # (on→upon, recall→hitrate, over→across, approximate→quantized,
    # decide→bound) — the word-4 swap breaks the normalized 40-char
    # head, so BOTH substring protocols provably miss it, while the
    # shingle Jaccard stays at 0.545 ≥ the 0.35 paraphrase threshold
    # and the MinHash bands collide (verified at build time; both
    # directions pinned in tests/test_hostile_parity.py).
    # 99014/99015 are the quality_filter_funnel STAGE plants (round-12
    # second wave): each passes every gate BEFORE its target stage —
    # 99013 alone cannot exercise the funnel's repetition stage
    # because it already dies at the quality gate (no stopwords,
    # short). 99014 is high-quality prose-shaped but one sentence
    # repeated 5x (dies exactly at repetition); 99015 is high-quality
    # unique prose with one planted email (dies exactly at PII). The
    # funnel monotonicity test pins that every stage bites.

    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{src}/embeddings.parquet')
          UNION ALL BY NAME
          SELECT * FROM (
            SELECT 99001 AS vec_id, NULL::FLOAT[] AS embedding, NULL::INTEGER AS label
            UNION ALL SELECT 99002, []::FLOAT[], 2
            UNION ALL SELECT 99003, list_transform(range(64), x -> 'nan'::FLOAT), 0
            UNION ALL SELECT 99004, list_prepend('inf'::FLOAT, list_transform(range(63), x -> 0.0::FLOAT)), 1
            UNION ALL SELECT 99005, list_prepend(NULL::FLOAT, list_transform(range(63), x -> 1.0::FLOAT)), 1
            UNION ALL SELECT 99006, list_transform(range(64), x -> 0.0::FLOAT), 2
            UNION ALL SELECT 99007, (SELECT embedding FROM read_parquet('{src}/embeddings.parquet') WHERE vec_id = 7), 1
            UNION ALL SELECT 99008, (SELECT embedding FROM read_parquet('{src}/embeddings.parquet') WHERE vec_id = 7), 1
            -- near-gate-limit magnitude (round 11, ADVICE r10): one clean
            -- in-domain vector at |x| = 9999.875, just under the 1e4 domain
            -- gates of the decimal-moment queries (mahalanobis, PQ error) —
            -- x² ≈ 1e8 sits at the TOP of the exact double→DECIMAL band
            -- (x²·1e6 < 2⁵³), so any bare-cast drift the tightened gates
            -- miss shows up here instead of on a real corpus. 9999.875 is
            -- exactly representable in FLOAT32 and its square has ≤ 6 dp.
            UNION ALL SELECT 99009, list_transform(range(64), x -> CASE WHEN x % 2 = 0 THEN 9999.875::FLOAT ELSE -9999.875::FLOAT END), 0
          )
        ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    return dst


if __name__ == "__main__":
    import sys

    out = build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/hostile_sf")
    print("hostile fixture written to", out)
