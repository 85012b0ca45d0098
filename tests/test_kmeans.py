"""Mini-batch k-means behaviour on separable synthetic clusters."""
import numpy as np

from dissc_tpu.models.kmeans import train_kmeans


def test_kmeans_finds_separated_clusters(rng):
    true_centers = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0], [10.0, 10.0]])
    batches = []
    for _ in range(8):
        labels = rng.integers(0, 4, 256)
        batches.append((true_centers[labels] + rng.normal(0, 0.3, (256, 2)))
                       .astype(np.float32))
    centroids, inertia = train_kmeans(batches, k=4, n_epochs=10, seed=0)
    assert centroids.shape == (4, 2)
    assert inertia < 1.0
    # each true center has a centroid within 0.5
    for c in true_centers:
        assert np.min(np.linalg.norm(centroids - c, axis=1)) < 0.5


def test_kmeans_codebook_plugs_into_quantizer(rng):
    import jax.numpy as jnp

    from dissc_tpu.models.hubert import kmeans_quantize

    batches = [rng.standard_normal((128, 8)).astype(np.float32) for _ in range(4)]
    centroids, _ = train_kmeans(batches, k=16, n_epochs=2, seed=1)
    units = np.asarray(kmeans_quantize(jnp.asarray(batches[0][None]),
                                       jnp.asarray(centroids)))
    assert units.shape == (1, 128)
    assert units.min() >= 0 and units.max() < 16
