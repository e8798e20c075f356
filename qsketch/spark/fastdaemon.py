"""Drop-in ``spark.python.daemon.module`` with the per-task protocol
fix pre-installed.

Usage (done by :func:`qsketch.spark.session.make_session`)::

    .config("spark.python.daemon.module", "qsketch.spark.fastdaemon")

The patch is installed in the daemon process BEFORE it forks workers,
so every forked worker inherits it and no task ever pays the ~210 ms
zip-directory re-read (see :mod:`qsketch.spark.workerpatch`).  On a
cluster, ship the package with ``spark-submit --py-files qsketch.zip``
— the daemon is launched with the pyFiles on its PYTHONPATH, so the
module resolves the same way it does locally.

Everything else is pyspark's own daemon, unmodified.
"""

from qsketch.spark.workerpatch import install

install()

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
