"""Registry/harvest-budget invariants (VERDICT r3 action 8).

The driver adjudicates registry entries in REGISTRATION ORDER under a run
budget (measured: exactly 50 entries in rounds 2 and 3). These guards make
the budget impossible to exceed silently: a new entry must either take a
slot in the explicit harvest window or consciously join the local-only
tail, and every entry must carry a DuckDB oracle unless it is explicitly
declared rows-only.
"""

import dataprofiler_spark.queries as q

# non-SQL-expressible operators allowed to skip the oracle (driver records
# a weaker rows-only check) — currently none: every entry has an oracle
ROWS_ONLY_ALLOWED: set[str] = set()


def test_every_entry_has_callable_and_oracle():
    queries = q.queries()
    oracles = q.oracle_sql()
    assert queries, "registry is empty"
    for name, fn in queries.items():
        assert callable(fn), name
        if name not in ROWS_ONLY_ALLOWED:
            sql = oracles.get(name)
            assert isinstance(sql, str) and sql.strip(), (
                f"{name} has no oracle SQL and is not declared rows-only"
            )


def test_harvest_window_invariants():
    """Pin the INVARIANTS, not a frozen roster (VERDICT r4 next-round #1):
    the first HARVEST_BUDGET registered entries are exactly the declared
    window, the never-harvested backlog leads it, the budget is exact, and
    there are no duplicates — adding an entry without updating the window
    (a conscious trade of a slot) fails here instead of silently pushing a
    never-harvested entry past the driver budget. The window CONTENT lives
    in queries.py (one place to rotate per round)."""
    names = list(q.queries())
    assert len(q._HARVEST_FIRST) == q.HARVEST_BUDGET
    assert names[: q.HARVEST_BUDGET] == q._HARVEST_FIRST
    # the never-harvested backlog leads the window
    assert names[: len(q._NEVER_HARVESTED)] == q._NEVER_HARVESTED
    # the three segments partition the window
    assert q._HARVEST_FIRST == (
        q._NEVER_HARVESTED + q._CHANGED_THIS_ROUND + q._LATE_NEW
    )


def test_no_duplicate_window_names():
    assert len(set(q._HARVEST_FIRST)) == len(q._HARVEST_FIRST)


def test_oracle_tokenizer_literal_is_canonical():
    """CLAUDE.md rule 41: ONE tokenizer per engine. The oracles inline the
    DuckDB mirror as SQL text, so this pins every inlined copy to the
    canonical expressions.WORDS_SQL shape (same split pattern, same
    empty-token filter) — a future tokenizer change that updates
    WORDS_SQL but misses an inlined oracle fails HERE instead of
    silently reintroducing engine/oracle tokenization drift."""
    import re

    from dataprofiler_spark.functions.expressions import WORD_SPLIT_PATTERN

    canon = re.compile(
        r"list_filter\(regexp_split_to_array\("
        r"([A-Za-z_][A-Za-z_.0-9]*), '(.*?)'\), (\w+) -> \3 <> ''\)"
    )
    offenders = {}
    for name, sql in q.oracle_sql().items():
        n_raw = sql.count("regexp_split_to_array")
        if not n_raw:
            continue
        norm = re.sub(r"\s+", " ", sql)
        found = canon.findall(norm)
        if len(found) != n_raw or any(
            split != WORD_SPLIT_PATTERN for _, split, _ in found
        ):
            offenders[name] = found
    assert not offenders, (
        f"oracles with a tokenizer that diverges from WORDS_SQL: {offenders}"
    )
