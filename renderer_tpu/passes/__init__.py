"""Concrete render passes assembled from ops/* (the reference's
src/renderer/systems/), declared as frame-graph nodes in the full pipeline."""
