

def test_quality_repetition_empty_doc_matches_oracle(spark, tmp_path):
    """A whitespace-only document must tokenize to ZERO tokens on both
    engines (split('', ' ') yields [''] — one phantom token — unless
    filtered): n_tokens and the ratio columns have to agree with the
    DuckDB oracle even on blank docs, which the shipped fixtures never
    contain."""
    import duckdb

    from spotify_app_etl_spark.registry import load_all
    from tests.oracle import canonical_rows

    sf = str(tmp_path)
    docs = spark.createDataFrame(
        [
            (1, "a a b", "en", "web", 5),
            (2, "   \t  ", "en", "web", 6),  # whitespace-only
            (3, "", "en", "web", 0),  # empty
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.parquet(f"{sf}/documents.parquet")

    q = load_all()["ns_quality_repetition"]
    got = canonical_rows(q.fn(spark, sf).toPandas())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'")
    want = canonical_rows(con.sql(q.oracle).df())
    assert got == want
    # and the blank docs really scored 0 tokens, not 1
    n_by_doc = {r[0]: r[1] for r in got}  # cols sorted: doc_id, n_tokens, ...
    assert n_by_doc.get("2", n_by_doc.get(2)) in ("0", 0), got
