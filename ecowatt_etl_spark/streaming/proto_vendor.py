"""Resolve a ``google.protobuf`` runtime without pip (r7 verdict item 5).

Spark 4's ``transformWithStateInPandas`` Python worker speaks protobuf
to the JVM state server (``pyspark.sql.streaming.proto``), but this
container ships no ``google.protobuf`` wheel, which kept the API
env-gated through r7. Instead of a permanent gate, ``ensure_protobuf``
resolves a runtime in order:

1. an already-importable ``google.protobuf`` — nothing to do;
2. a pure-Python protobuf living elsewhere on the host under the plain
   ``google.*`` namespace. The Google Cloud SDK's App Engine platform
   tree ships protobuf 6.32.0 exactly so (found by the r8 resolution
   sweep; the SDK's other copy is re-namespaced ``cloudsdk.google.*``
   and unusable). The directory is appended to THIS process's
   ``sys.path`` and prepended to ``os.environ['PYTHONPATH']`` so the
   Spark python workers — forked from the JVM, which snapshots the
   driver environment at launch — resolve it too.

PySpark 4.1.2's generated ``StateMessage_pb2`` declares gencode
6.33.0; against the 6.32.0 runtime that one-minor skew trips protobuf's
compatibility-POLICY check (not a wire-format difference — proto3
binary encoding is stable). protobuf documents its own escape hatch,
``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK``, which this module sets
for the skewed-vendor case only, and then proves the combination with
an actual StateRequest serialize/parse round-trip before declaring the
runtime usable.

ORDERING REQUIREMENT: workers inherit the environment captured when
the JVM starts, so ``ensure_protobuf`` must run BEFORE the
SparkSession is created — ``session.get_spark`` does it automatically.
A foreign session built without it (e.g. an external harness) still
runs every non-TWS operator; ``stateful_totals_tws`` documents the
requirement in its gate error. Deployments can point
``ECOWATT_PROTOBUF_PATH`` at any directory containing a plain
``google/protobuf`` tree.
"""

from __future__ import annotations

import os
import sys

_CANDIDATES = (
    os.environ.get("ECOWATT_PROTOBUF_PATH", ""),
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)

# Runtime memo-state lives in a DICT, not bare module scalars: the
# evidence ledger fingerprints simple module constants reached by a
# query closure, and a scalar that flips at runtime (None -> True
# after the first vendored import) would make q277's fingerprint
# depend on WHEN it was computed (the r10 mid-suite window flake).
# Dicts are runtime state by repo convention and are not hashed.
_MEMO: dict = {"resolved": None, "zip_path": None}


def _roundtrip_ok() -> bool:
    """The only proof that matters: the pyspark-generated state-server
    messages must serialize and parse under whatever runtime resolved."""
    try:
        from pyspark.sql.streaming.proto import StateMessage_pb2 as m

        req = m.StateRequest(version=2)
        return m.StateRequest.FromString(req.SerializeToString()).version == 2
    except Exception:
        return False


def ensure_protobuf() -> bool:
    """Idempotent; True iff google.protobuf is usable for the
    transformWithState protocol after this call."""
    if _MEMO["resolved"] is not None:
        return _MEMO["resolved"]
    try:
        import google.protobuf  # noqa: F401

        _MEMO["resolved"] = _roundtrip_ok()
        return _MEMO["resolved"]
    except ImportError:
        pass
    for root in _CANDIDATES:
        if not root or not os.path.isfile(
            os.path.join(root, "google", "protobuf", "__init__.py")
        ):
            continue
        # the documented escape hatch for the gencode-minor skew; must
        # be in the env BEFORE the JVM starts so workers inherit it
        os.environ["TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"] = "true"
        os.environ["PYTHONPATH"] = (
            root + os.pathsep + os.environ.get("PYTHONPATH", "")
        ).rstrip(os.pathsep)
        sys.path.append(root)  # append: never shadow real site-packages
        try:
            import google.protobuf  # noqa: F401
        except ImportError:
            sys.path.remove(root)
            continue
        _MEMO["resolved"] = _roundtrip_ok()
        if _MEMO["resolved"]:
            return True
    _MEMO["resolved"] = False
    return False


def _patched_zip() -> str | None:
    """Build (once per host temp dir) a zip of the vendored
    ``google/protobuf`` tree, importable by zipimport: an explicit
    ``google/__init__.py`` is injected (the SDK ships ``google`` as a
    filesystem namespace package, which a zip entry cannot express),
    and the runtime-version validator is overridden with a no-op
    APPENDED inside the zip's copy of ``runtime_version.py`` — the
    zip route cannot set ``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK``
    in a worker that already inherited its environment, so the escape
    hatch has to travel with the code. Same 6.33-gencode/6.32-runtime
    minor skew, same proto3-stable wire format, same proof
    (``_roundtrip_ok``) before anything trusts it."""
    if _MEMO["zip_path"] is not None:
        zp = _MEMO["zip_path"]
        return zp if os.path.isfile(zp) else None
    import tempfile
    import zipfile

    root = next(
        (
            r
            for r in _CANDIDATES
            if r
            and os.path.isfile(
                os.path.join(r, "google", "protobuf", "__init__.py")
            )
        ),
        None,
    )
    if root is None:
        return None
    dest = os.path.join(tempfile.gettempdir(), "ecowatt_vendored_protobuf.zip")
    tmp = dest + f".tmp.{os.getpid()}"
    gdir = os.path.join(root, "google", "protobuf")
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("google/__init__.py", "")
        for d, _, files in os.walk(gdir):
            for f in files:
                if not f.endswith(".py"):
                    continue
                p = os.path.join(d, f)
                arc = os.path.relpath(p, root)
                if arc == os.path.join("google", "protobuf", "runtime_version.py"):
                    with open(p, encoding="utf-8") as fh:
                        body = fh.read()
                    z.writestr(
                        arc,
                        body
                        + "\n\n# ecowatt vendor shim: pyspark gencode 6.33.0"
                        " vs this 6.32.0 runtime\n"
                        "def ValidateProtobufRuntimeVersion(*_a, **_k):\n"
                        "    return None\n",
                    )
                else:
                    z.write(p, arc)
    os.replace(tmp, dest)  # atomic: concurrent builders converge
    _MEMO["zip_path"] = dest
    return dest


def ensure_protobuf_on(spark) -> bool:
    """Flip ``transformWithStateInPandas`` live on an ALREADY-RUNNING
    session whose JVM launched without the vendor env (an external
    harness session). ``ensure_protobuf`` covers the driver side
    post-hoc (``sys.path`` works any time in this process); the
    workers are the hard part, and ``sc.addPyFile`` does NOT solve
    them: TWS validates state schema through a dedicated "driver
    worker" python process
    (``pyspark/sql/streaming/transform_with_state_driver_worker.py``)
    that never reads the python-includes list — it imports the
    state-server proto at module import, straight off its inherited
    ``PYTHONPATH``. What DOES reach it is the per-function worker
    environment: pyspark sends ``sc.environment`` with every pickled
    function, and the JVM's PythonWorkerFactory keys daemon processes
    by (exec, env) — so mutating ``sc.environment['PYTHONPATH']``
    post-launch spawns fresh daemons that inherit the vendored zip.
    Measured live on a vanilla ``SparkSession.builder`` session in
    tests/test_streaming.py::test_tws_under_foreign_session.

    Callers still need the (runtime, per-session) RocksDB provider
    conf — TWS refuses HDFS-backed state stores.

    True iff the protocol is usable driver-side AND worker-side after
    this call."""
    if not ensure_protobuf():
        return False
    try:
        import google.protobuf as _gp

        vendor_resolved = any(
            r and getattr(_gp, "__file__", "").startswith(r)
            for r in _CANDIDATES
        )
    except ImportError:  # pragma: no cover — ensure_protobuf just passed
        return False
    if not vendor_resolved:
        return True  # a real installed wheel: workers resolve it natively
    jvm_pp = (
        spark.sparkContext._jvm.java.lang.System.getenv("PYTHONPATH") or ""
    )
    if any(r and r in jvm_pp for r in _CANDIDATES):
        return True  # vendor env preceded JVM launch (session.get_spark)
    z = _patched_zip()
    if z is None:
        return False
    env = spark.sparkContext.environment
    cur = env.get("PYTHONPATH", "")
    if z not in cur.split(os.pathsep):
        env["PYTHONPATH"] = (z + os.pathsep + cur).rstrip(os.pathsep)
    return True
