"""Sandbox-only protobuf shim, auto-imported by ``site`` in every
Python process whose PYTHONPATH leads with this directory (i.e. the
Spark python workers spawned for transformWithState).

This container ships no installable ``google.protobuf``; the gcloud
appengine bundle carries a working 6.32 runtime, symlinked next to
this file (``google/protobuf``). PySpark's generated
StateMessage_pb2 was genned by protoc 6.33, and protobuf's runtime
check refuses a one-minor-older runtime outright — for the standard
proto3 messages the state server exchanges, the 6.32 runtime handles
6.33 gencode fine, so neutralize the advisory check. If the wire
format ever actually diverged, the streaming==batch test comparing
emitted rows would fail loudly — the check is not the safety net
here, the test is.

Production deployments install a matching protobuf and never load
this directory; nothing in the engine imports it.
"""

try:
    from google.protobuf import runtime_version as _rv

    _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
except Exception:
    pass
