"""prohap_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the ProGenNo/ProHap reference pipeline.

Everything here is a brand-new, Spark-first design: logical plans are
declared with the DataFrame/SQL API and optimized by Catalyst; the only
custom code is library-level (interval join rewrite, FASTA/VCF/GTF
sources, grouped-map domain kernels) — see SURVEY.md §4/§7.
"""

__version__ = "0.1.0"
