# Spawn N looping ffmpeg RTSP listeners (one camera simulator per port),
# for multi-stream demos without real cameras — Windows twin of
# rtsp-multistream.sh.
#
#   .\scripts\rtsp-multistream.ps1 -Video demo.mp4 [-Count 4] [-BasePort 8554]
#
# Stream i serves rtsp://127.0.0.1:(BasePort+i)/cam-<i>

param(
    [Parameter(Mandatory = $true)][string]$Video,
    [int]$Count = 4,
    [int]$BasePort = 8554
)

if (-not (Get-Command ffmpeg -ErrorAction SilentlyContinue)) {
    Write-Error "ffmpeg not found on PATH"
    exit 1
}
if (-not (Test-Path $Video)) {
    Write-Error "video file not found: $Video"
    exit 1
}

$procs = @()
try {
    for ($i = 0; $i -lt $Count; $i++) {
        $port = $BasePort + $i
        $name = "cam-{0:d2}" -f $i
        $url = "rtsp://0.0.0.0:${port}/${name}"
        $ffmpegArgs = @(
            "-nostdin", "-loglevel", "warning",
            "-stream_loop", "-1", "-re", "-i", $Video,
            "-c:v", "libx264", "-preset", "veryfast", "-tune", "zerolatency",
            "-an",
            "-f", "rtsp", "-rtsp_transport", "tcp", "-muxdelay", "0.1",
            "-listen", "1", $url
        )
        $p = Start-Process -FilePath "ffmpeg" -ArgumentList $ffmpegArgs `
            -NoNewWindow -PassThru
        $procs += $p
        Write-Host "simulator $name on rtsp://127.0.0.1:${port}/${name} (pid $($p.Id))"
    }
    Write-Host "serving $Count RTSP streams; ctrl-c to stop"
    Wait-Process -Id ($procs | ForEach-Object Id)
}
finally {
    Write-Host "stopping $($procs.Count) simulators..."
    foreach ($p in $procs) {
        if (-not $p.HasExited) { Stop-Process -Id $p.Id -Force -ErrorAction SilentlyContinue }
    }
}
