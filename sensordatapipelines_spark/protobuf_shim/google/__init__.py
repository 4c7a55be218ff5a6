"""Aliasing shim: expose the Google Cloud SDK's vendored pure-python
protobuf runtime (public, Apache-2.0, shipped in this container at
``/usr/lib/google-cloud-sdk/lib/third_party/cloudsdk/google/protobuf``)
under its canonical ``google.protobuf`` name.

Why: executing ``transformWithStateInPandas`` requires ``google.protobuf``
in the streaming Python runner (Spark's state-server protocol,
``pyspark/sql/streaming/proto/StateMessage_pb2.py``), and this container
has no installable protobuf. The SDK vendors protobuf 4.23 with its
imports rewritten to a ``cloudsdk.`` prefix, so a plain path entry can't
expose it; instead a meta-path finder aliases every
``google.protobuf[.X]`` import to ``cloudsdk.google.protobuf[.X]`` —
single module identity, no files copied.

Two deliberate deviations, both proven by executed round-trip tests
(tests/test_streaming.py) rather than assumed:

- ``runtime_version`` (absent from a 4.23-era runtime) is synthesized with
  a no-op ``ValidateProtobufRuntimeVersion``: the gencode's version gate
  is advisory; actual wire compatibility is what the tests exercise.
- The module registers under BOTH names in ``sys.modules`` because
  from-imports resolve through the aliased parent's ``__name__``.

This directory is NOT on the normal import path — it only becomes visible
when ``ensure_streaming_protobuf`` (streaming/stateful.py) prepends it to
``PYTHONPATH`` before the JVM launches, and only when a real
``google.protobuf`` is absent. Environments with protobuf installed never
see it.
"""

import importlib
import importlib.abc
import importlib.machinery
import os
import sys
import types

# SDP_PROTOBUF_PATH overrides the default SDK location (the shim must keep
# working when the SDK moves or the vendored copy lives elsewhere).
_SDK = os.environ.get(
    "SDP_PROTOBUF_PATH", "/usr/lib/google-cloud-sdk/lib/third_party"
)
if os.path.isdir(_SDK) and _SDK not in sys.path:
    sys.path.append(_SDK)

_rv = types.ModuleType("google.protobuf.runtime_version")


class _Domain:
    GOOGLE_INTERNAL = 1
    PUBLIC = 2


_rv.Domain = _Domain
_rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
sys.modules["google.protobuf.runtime_version"] = _rv
sys.modules["cloudsdk.google.protobuf.runtime_version"] = _rv


class _AliasLoader(importlib.abc.Loader):
    def __init__(self, target):
        self.target = target

    def create_module(self, spec):
        return importlib.import_module(self.target)

    def exec_module(self, module):
        pass


class _AliasFinder(importlib.abc.MetaPathFinder):
    def find_spec(self, fullname, path=None, target=None):
        if fullname == "google.protobuf" or fullname.startswith("google.protobuf."):
            return importlib.machinery.ModuleSpec(
                fullname, _AliasLoader("cloudsdk." + fullname)
            )
        return None


sys.meta_path.insert(0, _AliasFinder())
import cloudsdk.google.protobuf as _pb  # noqa: E402

_pb.runtime_version = _rv
