from anuraxla.detect.radial import RadialFit, fit_radial, radial_decide  # noqa: F401
from anuraxla.detect.gaussian_map import MapFit, fit_map, map_decide  # noqa: F401
