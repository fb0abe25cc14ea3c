"""Driver-contract invariants for __spark_entry__ (no Spark needed)."""


def test_queries_and_oracles_align():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    # every query needs an oracle unless explicitly declared rows-only
    # (non-SQL-expressible, e.g. iterative bin packing)
    assert set(q) - set(o) == set(e.ROWS_ONLY), (
        f"missing oracles: {sorted(set(q) - set(o) - e.ROWS_ONLY)}; "
        f"undeclared rows-only: {sorted(e.ROWS_ONLY - (set(q) - set(o)))}"
    )
    assert not (set(o) - set(q)), f"orphan oracles: {sorted(set(o) - set(q))}"
    assert len(q) >= 69
    for name, sql in o.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
        # the materialize-CTEs rewrite must have applied to WITH-based
        # oracles (unrolled chains explode exponentially without it)
        if sql.lstrip().upper().startswith("WITH"):
            assert "AS MATERIALIZED (" in sql, name


def test_all_oracles_parse_in_duckdb():
    """Every oracle must at least PREPARE against empty tables —
    catches SQL syntax/column errors without paying execution."""
    import duckdb

    import __spark_entry__ as e

    con = duckdb.connect()
    con.execute("CREATE TABLE events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type VARCHAR, props VARCHAR)")
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    con.execute("CREATE TABLE embeddings (vec_id BIGINT, embedding FLOAT[])")
    for t in "region nation customer supplier part orders lineitem".split():
        con.execute(f"CREATE TABLE {t} (dummy INT)")
    for name, sql in e.oracle_sql().items():
        try:
            con.execute(f"SELECT * FROM ({sql}) LIMIT 0")
        except Exception as ex:  # pragma: no cover - failure reporting
            raise AssertionError(f"oracle {name} failed to execute on empty tables: {ex}")
