"""Column-expression and pure-Python function libraries (UDF-free where possible)."""
