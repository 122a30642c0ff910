from .tracer import PointSourceTracer, Raytracer, Source, parallel_rays  # noqa: F401
