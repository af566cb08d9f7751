"""Arrow Flight service (reference: crates/server).

Requires pyarrow; import lazily so the core library works without it.
"""

__all__ = ["GraphFlightServer", "serve"]


def __getattr__(name):
    if name in __all__:
        from graph_tpu.server.flight import GraphFlightServer, serve

        return {"GraphFlightServer": GraphFlightServer, "serve": serve}[name]
    raise AttributeError(name)
