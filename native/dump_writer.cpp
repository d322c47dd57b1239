// Asynchronous trajectory/dump writer (native runtime component).
//
// Plays the role of LAMMPS's `dump custom` (xiaocase1/in.lammps:31) and
// OpenFOAM's time-directory writers in the reference: streaming particle
// and field snapshots to disk WITHOUT blocking the device compute loop.
// A dedicated worker thread drains a bounded frame queue; the Python side
// hands over host buffers via ctypes and returns immediately.
//
// Formats:
//   - "text": LAMMPS-style dump frames (ITEM: TIMESTEP / NUMBER OF ATOMS /
//     BOX BOUNDS / ATOMS id type diameter mass x y z vx vy vz) readable by
//     the reference's own postprocessing scripts (e.g. xiaocase3's
//     `grep "1 1" snapshot.bubblemd`).
//   - "bin": raw little-endian frames (step, n, then the column block) for
//     fast analysis loads.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Frame {
    int64_t step;
    int64_t n;
    int64_t ncols;
    std::vector<double> data;   // n * ncols, row-major
    std::vector<int32_t> ids;   // n
    std::vector<int32_t> types; // n
};

struct Writer {
    FILE* f = nullptr;
    bool binary = false;
    double box[6] = {0, 0, 0, 0, 0, 0};
    std::deque<Frame> queue;
    std::mutex mu;
    std::condition_variable cv;
    std::thread worker;
    std::atomic<bool> stop{false};
    size_t max_queue = 8;

    void run() {
        for (;;) {
            Frame fr;
            {
                std::unique_lock<std::mutex> lk(mu);
                cv.wait(lk, [&] { return stop.load() || !queue.empty(); });
                if (queue.empty()) {
                    if (stop.load()) return;
                    continue;
                }
                fr = std::move(queue.front());
                queue.pop_front();
            }
            cv.notify_all();
            write_frame(fr);
        }
    }

    void write_frame(const Frame& fr) {
        if (binary) {
            int64_t hdr[2] = {fr.step, fr.n};
            fwrite(hdr, sizeof(int64_t), 2, f);
            fwrite(fr.ids.data(), sizeof(int32_t), fr.n, f);
            fwrite(fr.types.data(), sizeof(int32_t), fr.n, f);
            fwrite(fr.data.data(), sizeof(double), fr.n * fr.ncols, f);
        } else {
            fprintf(f, "ITEM: TIMESTEP\n%lld\n", (long long)fr.step);
            fprintf(f, "ITEM: NUMBER OF ATOMS\n%lld\n", (long long)fr.n);
            fprintf(f, "ITEM: BOX BOUNDS ff ff ff\n");
            for (int a = 0; a < 3; ++a)
                fprintf(f, "%.9g %.9g\n", box[2 * a], box[2 * a + 1]);
            fprintf(f, "ITEM: ATOMS id type diameter mass x y z vx vy vz\n");
            for (int64_t i = 0; i < fr.n; ++i) {
                const double* row = fr.data.data() + i * fr.ncols;
                fprintf(f, "%d %d", fr.ids[i], fr.types[i]);
                for (int64_t c = 0; c < fr.ncols; ++c)
                    fprintf(f, " %.9g", row[c]);
                fputc('\n', f);
            }
        }
        fflush(f);
    }
};

}  // namespace

extern "C" {

void* dump_open(const char* path, int binary, const double* box6) {
    auto* w = new Writer();
    w->f = fopen(path, binary ? "wb" : "w");
    if (!w->f) {
        delete w;
        return nullptr;
    }
    w->binary = binary != 0;
    if (box6) memcpy(w->box, box6, 6 * sizeof(double));
    w->worker = std::thread([w] { w->run(); });
    return w;
}

// Enqueue one frame (copies the buffers; returns immediately unless the
// queue is full, then blocks until the worker catches up).
int dump_write(void* handle, long long step, long long n, long long ncols,
               const int32_t* ids, const int32_t* types,
               const double* data) {
    auto* w = static_cast<Writer*>(handle);
    if (!w || !w->f) return -1;
    Frame fr;
    fr.step = step;
    fr.n = n;
    fr.ncols = ncols;
    fr.ids.assign(ids, ids + n);
    fr.types.assign(types, types + n);
    fr.data.assign(data, data + n * ncols);
    {
        std::unique_lock<std::mutex> lk(w->mu);
        w->cv.wait(lk, [&] { return w->queue.size() < w->max_queue; });
        w->queue.push_back(std::move(fr));
    }
    w->cv.notify_all();
    return 0;
}

// Pending frames not yet on disk (for tests / backpressure monitoring).
long long dump_pending(void* handle) {
    auto* w = static_cast<Writer*>(handle);
    std::lock_guard<std::mutex> lk(w->mu);
    return (long long)w->queue.size();
}

void dump_close(void* handle) {
    auto* w = static_cast<Writer*>(handle);
    if (!w) return;
    {
        std::lock_guard<std::mutex> lk(w->mu);
        w->stop.store(true);
    }
    w->cv.notify_all();
    if (w->worker.joinable()) w->worker.join();
    // drain anything left (stop raced ahead of the worker)
    while (!w->queue.empty()) {
        w->write_frame(w->queue.front());
        w->queue.pop_front();
    }
    fclose(w->f);
    delete w;
}

}  // extern "C"
