from .engine import sample_tuples, sample_triples, sample_k, msac_score, best_model, RansacResult
from .spherical import spherical_ransac, sampson_error, SphericalRansacResult
from .triangulation import triangulation_ransac, triangulate_dlt, reprojection_sq_error, TriangulationResult
from .plane import plane_ransac, fit_plane_weighted, PlaneRansacResult
from .general_essential import general_essential_ransac, GeneralRansacResult
