"""Scene description, materials, lights, integrators — the rendering layer
the reference only sketched (Integrator.h/Shading.h/Lights.h design stubs)."""
