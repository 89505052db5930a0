"""Column-expression libraries (all JVM-side built-ins — no Python UDFs
on hot paths; SURVEY.md §7.3 scale posture)."""
