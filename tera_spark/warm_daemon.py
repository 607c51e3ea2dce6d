"""Warm PySpark worker daemon: pre-import the heavy Python dependencies
(pandas / pyarrow / numpy) ONCE in the daemon process so every forked
worker inherits them copy-on-write.

Why: each Arrow/pandas UDF worker otherwise imports pandas+pyarrow at its
first task (~1-2s CPU each, cold). At 32 concurrent task slots that is a
32-way import stampede per UDF stage — measured as hundreds of seconds of
"time to initialize Python workers" per stage on this box, the largest
non-scaling component after the kernel page-fault fix (see session.py).
Fork inherits a warm interpreter image, so worker init drops to ~ms.

Wired via ``spark.python.daemon.module`` (session.py); the standard
``pyspark.daemon.manager`` loop runs unchanged.
"""

import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401
import pyspark.sql.pandas.serializers  # noqa: F401
import pyspark.sql.pandas.types  # noqa: F401

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
