"""Worker-side importability for this package.

Anything cloudpickled to executor Python workers — the scbf DataSource
class, ``mapInPandas``/``applyInPandasWithState`` closures, pandas UDFs,
UDTFs — is pickled *by reference* to its defining module, so the worker
re-imports ``custom_columnar_format_spark``. That fails when the driver was
launched from a cwd where the package isn't on sys.path (the round driver
does exactly this). ``ensure_worker_imports`` ships the package as a zip via
``addPyFile`` — the standard mechanism, works identically on a real cluster
— so every closure-bearing operator is self-contained instead of depending
on whichever query happened to run first.
"""

from __future__ import annotations

import os

_SHIPPED: set[str] = set()  # SparkContext application IDs already shipped to


def ensure_worker_imports(spark) -> None:
    """Idempotently make this package importable on executor workers."""
    try:
        sc = spark.sparkSession.sparkContext if hasattr(spark, "sparkSession") else spark.sparkContext
    except Exception:
        return
    app_id = sc.applicationId
    if app_id in _SHIPPED:
        return
    try:
        import shutil
        import tempfile

        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        zip_base = os.path.join(
            tempfile.gettempdir(), f"scbf_pyfiles_{os.getpid()}", "custom_columnar_format_spark"
        )
        zip_path = zip_base + ".zip"
        if not os.path.exists(zip_path):
            os.makedirs(os.path.dirname(zip_base), exist_ok=True)
            shutil.make_archive(
                zip_base,
                "zip",
                root_dir=os.path.dirname(pkg_dir),
                base_dir=os.path.basename(pkg_dir),
            )
        sc.addPyFile(zip_path)
        _SHIPPED.add(app_id)
    except Exception:
        pass  # restricted env; worker import may still work via PYTHONPATH
