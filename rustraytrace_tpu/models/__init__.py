"""Scene catalog: every scene the reference can render, as builders."""

from .scenes import (
    SCENES,
    get_scene,
    book1_three_spheres,
    book1_random_spheres,
    book2_bouncing_spheres,
    book2_checkered_spheres,
    book2_earth,
    book2_perlin_spheres,
    book2_quads,
    book2_simple_light,
    book2_cornell_box,
    book2_cornell_smoke,
    book2_final_scene,
    book3_cornell_box,
    sphere_field_10k,
)

__all__ = [
    "SCENES",
    "get_scene",
    "book1_three_spheres",
    "book1_random_spheres",
    "book2_bouncing_spheres",
    "book2_checkered_spheres",
    "book2_earth",
    "book2_perlin_spheres",
    "book2_quads",
    "book2_simple_light",
    "book2_cornell_box",
    "book2_cornell_smoke",
    "book2_final_scene",
    "book3_cornell_box",
    "sphere_field_10k",
]
