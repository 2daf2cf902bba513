"""Custom-scene COLMAP preprocessing CLI (parity: reference
run_colmap.py)."""
import argparse

from neuray_tpu.data.colmap_process import (
    process_example_dataset, clear_project, visualize_camera_locations)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--example_name", type=str, default="desktop")
    parser.add_argument("--colmap", type=str, default="colmap",
                        help="path to the colmap executable")
    parser.add_argument("--same_camera", action="store_true", default=True)
    parser.add_argument("--clear", action="store_true",
                        help="remove intermediate artifacts afterwards")
    flags = parser.parse_args()

    root = f"data/example/{flags.example_name}"
    process_example_dataset(root, flags.colmap, flags.same_camera)
    visualize_camera_locations(root, flags.example_name)
    if flags.clear:
        clear_project(root)


if __name__ == "__main__":
    main()
