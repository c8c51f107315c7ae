"""sparksonar — a PySpark-native analytics engine with the query and
data-processing capabilities of rki-mf1/covsonar, re-expressed Spark-first.

Layout:
    session     SparkSession factory tuned for columnar genomic analytics
    schemas     canonical StructTypes for the logical tables (FIXTURES.md §2)
    functions/  pure column-expression + pure-Python helper libraries
    operators/  the operator inventory from SURVEY.md §2 as DataFrame ops
    sources/    FASTA / GFF3 / lineage-TSV / metadata readers
    plans/      plan-inspection and optimization helpers
    streaming/  Structured Streaming variants of the event operators
"""

__version__ = "0.1.0"
