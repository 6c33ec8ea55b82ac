from .colmap import (
    write_colmap_text, read_colmap_text, read_colmap_binary, read_colmap_model,
    read_database, write_database, ColmapDatabase, ColmapModel,
    rotmat_to_quat, quat_to_rotmat, image_ids_to_pair_id, pair_id_to_image_ids,
)
from .tracks_io import write_feature_tracks, read_feature_tracks
from .nerf import export_nerf, read_poses, read_calib, poses_to_nerf_json
