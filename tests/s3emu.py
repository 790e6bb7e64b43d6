"""Back-compat shim: the S3 emulator moved into the package
(``dataflowtemplates_spark/testing/s3_emulator.py``) so registry
queries (q189's KeyedTable-over-HTTP lifecycle) can drive it from the
correctness driver, which imports only the package. Tests keep
importing it from here."""

from dataflowtemplates_spark.testing.s3_emulator import S3Emulator

__all__ = ["S3Emulator"]
