from .quartic import solve_quartic
from .spherical import solve_spherical_3pt, epipolar_constraint_rows
from .five_point import solve_essential_5pt, decompose_essential, cheirality_best
from .shared_focal import solve_shared_focal_6pt
from .eight_point import solve_essential_8pt
from .seven_point import solve_essential_7pt
