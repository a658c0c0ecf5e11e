"""Shared DuckDB oracle pieces for the public-suffix-list decision.

ONE copy of the rules-table setup and the suffix-length CASE (used by
tests/test_psl.py and tests/test_url.py) so a future rule-shape change
cannot drift between the two oracles — the same reason the Spark side
compiles everything against functions/psl.py.

The SQL fragments expect a row scope providing ``ls`` (the host's
label list from string_split(host, '.')) and ``n`` (its length); the
PS fragment additionally defines the alias ``ps`` consumers reference.
"""

from __future__ import annotations

from fusus_spark.functions.psl import PSL_SNAPSHOT, compile_rules


def install_psl_rules(con, rules=None, strict: bool = True) -> None:
    """Create + fill the rules tables in a DuckDB connection."""
    compiled = compile_rules(
        rules if rules is not None else PSL_SNAPSHOT, strict=strict
    )
    for name in ("set2", "set3", "set4", "wild1", "wild2", "wild3",
                 "exc2", "exc3", "exc4"):
        con.sql(f"CREATE OR REPLACE TABLE {name} (r VARCHAR)")
        vals = sorted(compiled[name])
        if vals:
            con.executemany(f"INSERT INTO {name} VALUES (?)", [(v,) for v in vals])


# public-suffix label count (the publicsuffix.org algorithm: exceptions
# beat everything, then longest match, default 1)
PSL_PS_CASE = """
    CASE
      WHEN n >= 4 AND array_to_string(list_slice(ls, n-3, n), '.') IN (SELECT r FROM exc4) THEN 3
      WHEN n >= 3 AND array_to_string(list_slice(ls, n-2, n), '.') IN (SELECT r FROM exc3) THEN 2
      WHEN n >= 2 AND array_to_string(list_slice(ls, n-1, n), '.') IN (SELECT r FROM exc2) THEN 1
      WHEN n >= 4 AND (array_to_string(list_slice(ls, n-3, n), '.') IN (SELECT r FROM set4)
                    OR array_to_string(list_slice(ls, n-2, n), '.') IN (SELECT r FROM wild3)) THEN 4
      WHEN n >= 3 AND (array_to_string(list_slice(ls, n-2, n), '.') IN (SELECT r FROM set3)
                    OR array_to_string(list_slice(ls, n-1, n), '.') IN (SELECT r FROM wild2)) THEN 3
      WHEN n >= 2 AND (array_to_string(list_slice(ls, n-1, n), '.') IN (SELECT r FROM set2)
                    OR ls[n] IN (SELECT r FROM wild1)) THEN 2
      ELSE 1 END
"""

# registrable domain given ls/n/ps in scope ('' when host IS a suffix)
PSL_DOMAIN_EXPR = """
       CASE WHEN n > ps THEN array_to_string(list_slice(ls, n-ps, n), '.')
            ELSE '' END
"""
