"""Query-plan library: the reference's analytics queries (SURVEY.md §2.3–§2.6,
display.py / sql.py) re-expressed as declarative DataFrame plans over the
driver-provided parquet tables, each paired with an ANSI-SQL oracle."""
