"""Test-side shim — the pure-Python reference oracle lives in the package
(auto_ria_spark/oracle.py) because the driver-facing ``oracle_sql()``
contract also uses it to emit VALUES-based expected rows."""

from auto_ria_spark.oracle import (  # noqa: F401
    OracleResult,
    corpus_verify_expected,
    crawl_oracle,
    extract_car,
    normalize_phone,
    values_sql,
)
