from . import quaternion, sh, gaussian_math, camera, knn, lie, spline, dual_quaternion, arap, image, mesh, sugar_reg  # noqa: F401
