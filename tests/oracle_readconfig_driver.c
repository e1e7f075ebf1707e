/* Original test driver that links the REFERENCE config parser
 * (/root/reference/src/tools/readconfig.c) as a behavioral oracle for
 * ecckd_tpu/config.py.  Compiled at test time by test_readconfig_oracle.py;
 * this file contains no reference code itself.
 *
 * Modes:
 *   oracle sprint <file>                 rc_read + print rc_sprint
 *   oracle args <file-or-> <argv...>     DataFileEngineCfg-style construction
 *                                        (rc_register_files + rc_read of the
 *                                        first .cfg + rc_register_args),
 *                                        then print rc_sprint
 *   oracle read <file> <key>...          typed reader outputs per key
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "readconfig.h"

/* Print s with newlines/tabs escaped so one value stays on one line */
static void print_escaped(const char *s)
{
    for (; *s; s++) {
        if (*s == '\n') {
            fputs("\\n", stdout);
        } else if (*s == '\t') {
            fputs("\\t", stdout);
        } else {
            fputc(*s, stdout);
        }
    }
}

static void print_sprint(rc_data *data)
{
    char *s = rc_sprint(data);
    if (s) {
        printf("SPRINT\t%s\n", s);
        rc_free(s);
    } else {
        printf("SPRINT\t(null)\n");
    }
}

int main(int argc, const char **argv)
{
    if (argc < 3) {
        fprintf(stderr, "usage: %s <mode> <file> ...\n", argv[0]);
        return 2;
    }
    const char *mode = argv[1];
    const char *file = argv[2];

    if (strcmp(mode, "sprint") == 0) {
        rc_data *data = rc_read(file, stderr);
        if (!data) {
            printf("ERROR\n");
            return 0;
        }
        print_sprint(data);
        rc_clear(data);
        return 0;
    }

    if (strcmp(mode, "args") == 0) {
        /* argv[3..] plays the role of the full tool argv (argv[3] is the
         * executable name), mirroring DataFileEngineCfg.cpp:60-83 */
        int targc = argc - 3;
        const char **targv = argv + 3;
        rc_data *data = rc_read(NULL, stderr);
        if (!data) { printf("ERROR\n"); return 0; }
        rc_register_files(data, targc, targv);
        {
            int ifile = rc_get_file(targc, targv);
            if (ifile > 0) {
                if (!rc_append(data, targv[ifile], stderr)) {
                    printf("ERROR\n");
                    rc_clear(data);
                    return 0;
                }
            }
        }
        rc_register_args(data, targc, targv);
        print_sprint(data);
        rc_clear(data);
        return 0;
    }

    if (strcmp(mode, "read") == 0) {
        rc_data *data = rc_read(file, stderr);
        if (!data) { printf("ERROR\n"); return 0; }
        for (int i = 3; i < argc; i++) {
            const char *key = argv[i];
            int status = 0, m = 0, n = 0, len = 0, j = 0;
            printf("KEY\t%s\n", key);
            printf("exists\t%d\n", rc_exists(data, key));
            printf("boolean\t%d\n", rc_get_boolean(data, key));
            {
                int v = rc_get_int(data, key, &status);
                printf("int\t%d\t%d\n", status, status ? v : 0);
            }
            {
                rc_real v = rc_get_real(data, key, &status);
                printf("real\t%d\t%.17g\n", status, status ? (double)v : 0.0);
            }
            {
                char *s = rc_get_string(data, key);
                fputs("string\t", stdout);
                print_escaped(s ? s : "(null)");
                fputc('\n', stdout);
                if (s) rc_free(s);
            }
            len = rc_size(data, key, &m, &n);
            printf("size\t%d\t%d\t%d\n", len, m, n);
            for (j = 0; j < len; j++) {
                char *s = rc_get_substring(data, key, j);
                printf("substr\t%d\t", j);
                print_escaped(s ? s : "(null)");
                fputc('\n', stdout);
                if (s) rc_free(s);
            }
            {
                rc_real *v = rc_get_real_vector(data, key, &len);
                printf("realvec\t%d", len);
                for (j = 0; j < len; j++) {
                    printf("\t%.17g", (double)v[j]);
                }
                printf("\n");
                if (v) rc_free(v);
            }
            {
                int *v = rc_get_int_vector(data, key, &len);
                printf("intvec\t%d", len);
                for (j = 0; j < len; j++) {
                    printf("\t%d", v[j]);
                }
                printf("\n");
                if (v) rc_free(v);
            }
        }
        rc_clear(data);
        return 0;
    }

    fprintf(stderr, "unknown mode %s\n", mode);
    return 2;
}
