"""In-process service emulators for protocol tests and driver-runnable
audit queries.

These are NOT production components — they are the controlled
counterparties the object-store backends are verified against:
:mod:`s3_emulator` (S3 REST subset: conditional puts, ListObjectsV2
pagination, fault injection, SigV4 verification) and
:mod:`gcs_emulator` (GCS JSON API subset: generation-match CAS). They
live in the package rather than under ``tests/`` because registry
queries (q189) drive full KeyedTable lifecycles over them, and the
correctness driver imports only the package.
"""
