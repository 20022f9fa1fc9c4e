"""End-to-end pipelines composed from karta_ray.stages."""
