from graph_tpu.server.flight import serve

if __name__ == "__main__":
    import sys

    location = sys.argv[1] if len(sys.argv) > 1 else "grpc://[::1]:50051"
    serve(location)
