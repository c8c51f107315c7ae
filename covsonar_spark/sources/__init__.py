"""Input connectors: FASTA, GFF3, lineage taxonomy, metadata CSV/TSV."""
