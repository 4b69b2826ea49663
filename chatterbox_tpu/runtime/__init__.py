def enable_compilation_cache(path: str = "/root/.jax_cache", min_secs: float = 5.0):
    """Persistent XLA compilation cache -- essential on remote-compile
    backends where large graphs take minutes to build."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", min_secs)
    except Exception:  # older jax or unsupported backend
        pass
