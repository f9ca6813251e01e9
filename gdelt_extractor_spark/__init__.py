"""gdelt_extractor_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of Jwmazzi/gdelt_extractor.

The reference (/root/reference) is a single-node pandas ETL pipeline
(GDELT CSV → pandas → PostgreSQL).  This package re-expresses every
capability as Spark DataFrame plans optimized by Catalyst, plus the
LLM-training-data operators (dedup / similarity / text analysis /
multimodal plumbing) a 100 TB pipeline needs.  See SURVEY.md §2 for
the capability inventory.
"""

__version__ = "0.1.0"
