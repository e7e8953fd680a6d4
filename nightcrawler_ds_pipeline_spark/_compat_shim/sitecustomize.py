"""Interpreter-startup shim for Spark transformWithState python runners.

Only reachable when ``nightcrawler_ds_pipeline_spark.compat.
ensure_tws_python_env`` put this directory on PYTHONPATH — which it does
only when the sole protobuf runtime on disk is the google-cloud-sdk
vendored 6.32 one (this sandbox has no pip-installed protobuf and pip
installs are off-limits). pyspark 4.1's StateMessage_pb2 gencode is 6.33,
and protobuf's version gate rejects ANY gencode newer than the runtime;
the one-minor skew is reviewed-safe for this message (plain scalar/enum
fields, no 6.33-only feature). The patch must live in sitecustomize
because the runner is a separate python process launched by the JVM —
in-process monkeypatching cannot reach it. Wrapped so a missing or
healthy protobuf makes this a no-op.
"""
try:
    from google.protobuf import runtime_version as _rv

    _orig = _rv.ValidateProtobufRuntimeVersion

    def _tolerant(*args, **kwargs):
        try:
            _orig(*args, **kwargs)
        except _rv.VersionError:
            pass

    _rv.ValidateProtobufRuntimeVersion = _tolerant
except Exception:
    pass
