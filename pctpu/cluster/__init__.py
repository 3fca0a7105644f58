from pctpu.cluster.kmeans import kmeans, K_Means  # noqa: F401
from pctpu.cluster.gmm import gmm_fit, gmm_predict, GMM, GMMState  # noqa: F401
from pctpu.cluster.dbscan import dbscan, DBSCAN  # noqa: F401
from pctpu.cluster.spectral import (  # noqa: F401
    spectral_clustering, spectral_embedding, spetral_clustering)
from pctpu.cluster.plane_ransac import (  # noqa: F401
    plane_ransac, segment_ground, PlaneResult)
