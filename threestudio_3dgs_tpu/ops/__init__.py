from . import quaternion, sh, gaussian_math, camera, knn, lie, spline, dual_quaternion, arap, image  # noqa: F401
