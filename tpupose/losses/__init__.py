from tpupose.losses.heatmap import joints_mse_loss

__all__ = ["joints_mse_loss"]
