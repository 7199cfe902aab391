"""File-format codecs: images, PFM / COLMAP-bin depth maps, cam.txt, pair.txt, PLY.

Capability parity with the reference's `datasets/data_io.py` (see that file's
functions `read_image`, `read_cam_file`, `read_pair_file`, `read_pfm`,
`read_bin`, `save_*`), re-implemented independently on numpy + PIL with a
native binary PLY writer (the reference used the `plyfile` package).
"""

from patchmatchnet_tpu.dataio.image import (
    read_image,
    save_image,
    scale_to_max_dim,
    resize_bilinear_np,
    read_image_dictionary,
)
from patchmatchnet_tpu.dataio.pfm import read_pfm, save_pfm
from patchmatchnet_tpu.dataio.colmap_bin import read_bin, save_bin
from patchmatchnet_tpu.dataio.maps import read_map, save_map
from patchmatchnet_tpu.dataio.cams import (
    read_cam_file,
    save_cam_file,
    read_pair_file,
    save_pair_file,
)
from patchmatchnet_tpu.dataio.ply import save_ply, read_ply

__all__ = [
    "read_image",
    "save_image",
    "scale_to_max_dim",
    "resize_bilinear_np",
    "read_image_dictionary",
    "read_pfm",
    "save_pfm",
    "read_bin",
    "save_bin",
    "read_map",
    "save_map",
    "read_cam_file",
    "save_cam_file",
    "read_pair_file",
    "save_pair_file",
    "save_ply",
    "read_ply",
]
