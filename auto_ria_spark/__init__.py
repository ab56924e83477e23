"""auto_ria_spark — a from-scratch PySpark-native crawl/analytics engine.

Re-expresses the capabilities of the reference single-process scraper
(`ursaloper/auto.ria-scraper`, see /root/reference) as an idiomatic Spark
DataFrame pipeline: a partitioned priority-queue URL frontier, a sharded
Bloom-filter URL-seen set backed by an exact anti-join, per-host politeness
budgets via window functions, vectorized (Arrow) pandas UDFs for the few
non-relational steps (image codecs), and snapshot-versioned tables for
checkpoint/resume.

Nothing in here is a port: the reference tells us WHAT to compute (crawl
ordering, dedup rules, field extraction semantics, output schema); the HOW
is Catalyst-planned DataFrame operations designed for a 1000-executor
cluster and a 10^10-row frontier.
"""

__version__ = "0.1.0"
