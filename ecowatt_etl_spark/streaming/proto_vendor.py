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

_resolved: bool | None = None


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
    global _resolved
    if _resolved is not None:
        return _resolved
    try:
        import google.protobuf  # noqa: F401

        _resolved = _roundtrip_ok()
        return _resolved
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
        _resolved = _roundtrip_ok()
        if _resolved:
            return True
    _resolved = False
    return False
