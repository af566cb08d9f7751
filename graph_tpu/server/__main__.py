from graph_tpu.server.flight import serve

if __name__ == "__main__":
    import os
    import sys

    # usage: python -m graph_tpu.server [grpc://host:port] [plan-cache-dir]
    location = sys.argv[1] if len(sys.argv) > 1 else "grpc://[::1]:50051"
    if len(sys.argv) > 2:
        os.environ["GRAPH_TPU_PLAN_CACHE"] = sys.argv[2]
    from graph_tpu import enable_compile_cache

    enable_compile_cache()
    serve(location)
