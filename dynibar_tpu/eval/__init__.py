"""Evaluation: metrics (PSNR/SSIM/LPIPS) and benchmark harnesses."""
