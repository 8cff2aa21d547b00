"""Clustering helpers.

Reference: lib/clustering.py (9-125): sklearn AgglomerativeClustering
subclass merging/reassigning undersized clusters.
"""

from __future__ import annotations

import numpy as np
from sklearn.cluster import AgglomerativeClustering

__all__ = ["AgglomerativeClusteringWithMinSize"]


class AgglomerativeClusteringWithMinSize(AgglomerativeClustering):
    """Agglomerative clustering with a minimum cluster size: points of
    undersized clusters are reassigned to the nearest valid cluster."""

    def __init__(
        self,
        min_cluster_size: int = 2,
        n_clusters: int = 2,
        metric: str = "euclidean",
        memory=None,
        connectivity=None,
        compute_full_tree="auto",
        linkage: str = "ward",
        distance_threshold=None,
    ):
        super().__init__(
            n_clusters=n_clusters,
            metric=metric,
            memory=memory,
            connectivity=connectivity,
            compute_full_tree=compute_full_tree,
            linkage=linkage,
            distance_threshold=distance_threshold,
        )
        self.min_cluster_size = min_cluster_size

    def fit(self, X, y=None):
        super().fit(X, y)
        labels = self.labels_
        while True:
            unique, counts = np.unique(labels, return_counts=True)
            if len(unique) < 3:
                break
            small = unique[counts < self.min_cluster_size]
            if len(small) == 0:
                break
            if len(small) == len(unique):
                smallest_two = unique[np.argsort(counts)[:2]]
                labels[labels == smallest_two[1]] = smallest_two[0]
                continue
            from sklearn.metrics import pairwise_distances

            distances = pairwise_distances(X)
            for sc in small:
                for point in np.where(labels == sc)[0]:
                    valid = np.where(~np.isin(labels, small))[0]
                    labels[point] = labels[valid[np.argmin(distances[point, valid])]]
        self.labels_ = labels
        self.n_clusters_ = len(np.unique(labels))
        return self
