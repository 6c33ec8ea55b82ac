from .quartic import solve_quartic
from .spherical import solve_spherical_3pt, epipolar_constraint_rows
